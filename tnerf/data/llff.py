"""LLFF dataset reader (poses_bounds.npy + images/).

The reference's LLFF branch is dead code — `load_data(LLFF, ...)` falls
through and returns an empty vector (loader/data_loader.cpp:140-148,
defect D15).  This is the real implementation.

Format (LLFF convention): poses_bounds.npy is [N, 17] — a flattened
[3, 5] matrix per image (rotation | translation | [H, W, focal]) plus
[near, far] depth bounds.  LLFF camera axes are [down, right, backwards];
we convert to the NeRF/OpenGL convention [right, up, backwards] used by
tnerf.cameras (columns swapped with a sign flip).  Images load from
`images_{downscale}/` when present, else `images/`.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from tnerf.data.dataset import ImageDataset
from tnerf.data.png_io import read_png

IMG_EXTS = (".png", ".jpg", ".jpeg", ".JPG", ".PNG")


def _image_dir(scene_dir: str, downscale: int) -> str:
    if downscale > 1:
        cand = os.path.join(scene_dir, f"images_{downscale}")
        if os.path.isdir(cand):
            return cand
    return os.path.join(scene_dir, "images")


def _list_images(d: str):
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(IMG_EXTS)
    )


def load_llff_scene(
    root: str,
    name: str,
    srgb_to_linear: bool = False,
    downscale: int = 1,
    holdout_every: int = 8,
) -> Dict[str, ImageDataset]:
    """Load an LLFF scene; every `holdout_every`-th view becomes the test
    split (the standard LLFF protocol)."""
    scene_dir = os.path.join(root, name)
    pb_path = os.path.join(scene_dir, "poses_bounds.npy")
    if not os.path.exists(pb_path):
        raise FileNotFoundError(f"no poses_bounds.npy under {scene_dir}")
    pb = np.load(pb_path)
    if pb.ndim != 2 or pb.shape[1] != 17:
        raise ValueError(f"poses_bounds.npy must be [N, 17]; got {pb.shape}")
    poses_raw = pb[:, :15].reshape(-1, 3, 5)
    bounds = pb[:, 15:17]  # [N, 2] near/far

    img_dir = _image_dir(scene_dir, downscale)
    paths = _list_images(img_dir)
    if len(paths) != len(pb):
        raise ValueError(
            f"{len(paths)} images in {img_dir} but {len(pb)} poses"
        )

    images = np.stack(
        [read_png(p, channels=4, srgb_to_linear=srgb_to_linear) for p in paths]
    ).astype(np.float32)
    h, w = images.shape[1:3]

    # [down, right, back] -> [right, up, back]: c2w columns (r0,r1,r2) =
    # (raw_col1, -raw_col0, raw_col2)
    c2w = np.zeros((len(pb), 4, 4), np.float32)
    c2w[:, 3, 3] = 1.0
    c2w[:, :3, 0] = poses_raw[:, :, 1]
    c2w[:, :3, 1] = -poses_raw[:, :, 0]
    c2w[:, :3, 2] = poses_raw[:, :, 2]
    c2w[:, :3, 3] = poses_raw[:, :, 3]

    # hwf stored at native resolution; rescale focal to loaded size
    focal_native = float(poses_raw[0, 2, 4])
    w_native = float(poses_raw[0, 1, 4])
    focal = focal_native * (w / w_native)

    idx = np.arange(len(pb))
    test_sel = (idx % holdout_every == 0) if holdout_every > 0 else np.zeros(len(pb), bool)
    out: Dict[str, ImageDataset] = {}
    for split, sel in (("train", ~test_sel), ("test", test_sel)):
        if not sel.any():
            continue
        out[split] = ImageDataset(
            images=images[sel],
            poses=c2w[sel],
            focal=focal,
            width=w,
            height=h,
            channels=images.shape[-1],
            split=split,
            near_far=bounds[sel].astype(np.float32),
        )
    return out
