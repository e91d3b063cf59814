"""NeRF-synthetic (and LLFF) dataset readers.

TPU-native replacement for reference loader/data_loader.{h,cpp}:
- `ImageDataset` mirrors the reference struct (data_loader.h:20-27):
  images, poses, focal, width, height, channels — plus the split name.
- `load_data(kind, name)` mirrors `load_data(SceneType, SyntheticName)`
  (data_loader.h:29-31) but loads *all three* splits (fixing D13), uses
  the correct `materials/` directory (fixing D12), and computes the focal
  correctly from `camera_angle_x` (fixing D8).

Host-side I/O is numpy; arrays are handed to JAX at the training-loop
boundary as one device_put of the full stacked tensors (no per-pixel host
loops — the anti-pattern at reference main.cu:525-542, D16).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from tnerf.cameras import focal_from_angle
from tnerf.data.png_io import read_png

SYNTHETIC_SCENES = (
    "chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship",
)
SPLITS = ("train", "val", "test")


@dataclass
class ImageDataset:
    """One split of one scene (reference ImageDataset, data_loader.h:20-27)."""

    images: np.ndarray   # [N, H, W, C] float32 in [0,1]
    poses: np.ndarray    # [N, 4, 4] float32 camera-to-world
    focal: float         # pixels (fx; scalar proxy even when intrinsics set)
    width: int
    height: int
    channels: int
    split: str = "train"
    # Per-view [near, far] depth bounds (LLFF); None for synthetic scenes.
    near_far: "np.ndarray | None" = None
    # Full pinhole intrinsics (fx, fy, cx, cy) for instant-ngp-style
    # transforms (fl_x/fl_y/cx/cy); None = centered isotropic pinhole
    # described by `focal` (the reference's camera model).
    intrinsics: "tuple | None" = None

    @property
    def camera(self):
        """What camera_rays/pixel_rays take as `focal_px`: the (fx, fy,
        cx, cy) tuple when the scene carries full intrinsics, else the
        scalar focal."""
        return self.intrinsics if self.intrinsics is not None else self.focal

    def __len__(self) -> int:
        return self.images.shape[0]

    def composited(self, white_background: bool = True) -> np.ndarray:
        """RGB images with alpha composited over white/black background."""
        if self.channels == 3:
            return self.images
        rgb, a = self.images[..., :3], self.images[..., 3:4]
        bg = 1.0 if white_background else 0.0
        return rgb * a + bg * (1.0 - a)


def load_images_json(
    scene_dir: str,
    split: str,
    srgb_to_linear: bool = False,
    downscale: int = 1,
) -> ImageDataset:
    """Parse transforms_{split}.json + PNGs (reference load_images_json,
    data_loader.cpp:34-94)."""
    tf_path = os.path.join(scene_dir, f"transforms_{split}.json")
    with open(tf_path) as fh:
        meta = json.load(fh)
    if "camera_angle_x" not in meta and "fl_x" not in meta:
        raise ValueError(
            f"{tf_path} has neither camera_angle_x (NeRF-synthetic) nor "
            "fl_x (instant-ngp style) — cannot derive a camera"
        )
    paths: List[str] = []
    poses: List[np.ndarray] = []
    for frame in meta["frames"]:
        img_path = os.path.join(scene_dir, frame["file_path"])
        if not os.path.splitext(img_path)[1]:
            img_path += ".png"
        paths.append(img_path)
        poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))

    # Fast path: native C++ thread-pool decode of the whole split
    # (tnerf/native; the reference decodes sequentially per file,
    # data_loader.cpp:34-84).
    images_u8 = None
    if not srgb_to_linear:
        try:
            from tnerf.native import png as native_png

            images_u8 = native_png.decode_batch(paths)
        except Exception:
            images_u8 = None
    if images_u8 is not None:
        images_arr = images_u8.astype(np.float32) / 255.0
    else:
        images_arr = np.stack(
            [read_png(p, channels=4, srgb_to_linear=srgb_to_linear) for p in paths]
        ).astype(np.float32)
    if downscale > 1:
        n, h, w, c = images_arr.shape
        images_arr = images_arr.reshape(
            n, h // downscale, downscale, w // downscale, downscale, c
        ).mean(axis=(2, 4))
    poses_arr = np.stack(poses)
    h, w = images_arr.shape[1:3]
    intrinsics = None
    if "fl_x" in meta:
        # instant-ngp-style transforms: explicit pixel intrinsics,
        # optionally anisotropic / off-center.  Values are stated at the
        # ORIGINAL resolution; a downscaled load divides them along with
        # the image dimensions.
        fx = float(meta["fl_x"])
        fy = float(meta.get("fl_y", fx))
        cx = float(meta.get("cx", 0.5 * w * downscale))
        cy = float(meta.get("cy", 0.5 * h * downscale))
        d = float(max(downscale, 1))
        fx, fy, cx, cy = fx / d, fy / d, cx / d, cy / d
        focal = fx
        if not (fx == fy and cx == 0.5 * w and cy == 0.5 * h):
            intrinsics = (fx, fy, cx, cy)
    else:
        focal = focal_from_angle(w, float(meta["camera_angle_x"]))
    return ImageDataset(
        images=images_arr, poses=poses_arr, focal=focal,
        width=w, height=h, channels=images_arr.shape[-1], split=split,
        intrinsics=intrinsics,
    )


def load_synthetic_scene(
    root: str, name: str, srgb_to_linear: bool = False, downscale: int = 1,
    splits=SPLITS,
) -> Dict[str, ImageDataset]:
    """All splits of one NeRF-synthetic scene (fixes D12/D13).

    Any directory in NeRF-synthetic format loads (e.g. exported
    procedural scenes — tools/dress_rehearsal.py); the reference's scene
    enum (data_loader.h:10-18) is only consulted for a better error when
    the directory is missing."""
    scene_dir = os.path.join(root, name)
    if not os.path.isdir(scene_dir) and name not in SYNTHETIC_SCENES:
        raise ValueError(
            f"unknown synthetic scene {name!r}: no directory {scene_dir} "
            f"and not one of the standard scenes {SYNTHETIC_SCENES}"
        )
    out = {}
    for split in splits:
        if os.path.exists(os.path.join(scene_dir, f"transforms_{split}.json")):
            out[split] = load_images_json(
                scene_dir, split, srgb_to_linear=srgb_to_linear, downscale=downscale
            )
    if not out:
        raise FileNotFoundError(f"no transforms_*.json under {scene_dir}")
    return out


def load_llff_scene(root: str, name: str, **kw) -> Dict[str, ImageDataset]:
    """LLFF reader (poses_bounds.npy) — real implementation of the
    reference's dead branch (data_loader.cpp:140-148, D15)."""
    from tnerf.data.llff import load_llff_scene as _impl

    return _impl(root, name, **kw)


def scene_proc_kwargs(scene_cfg) -> Dict[str, int]:
    """generate_procedural_scene overrides from a SceneConfig's proc_*
    fields (0 = keep the library default for that parameter)."""
    names = ("width", "height", "n_train", "n_val", "n_test", "n_samples")
    out = {}
    for n in names:
        v = getattr(scene_cfg, f"proc_{n}", 0)
        if v:
            out[n] = int(v)
    return out


def scene_llff_kwargs(scene_cfg) -> Dict[str, float]:
    """load_llff_scene preprocessing kwargs from a SceneConfig (pose
    recentering + bd_factor rescale — the NDC prerequisites)."""
    out: Dict[str, float] = {}
    if getattr(scene_cfg, "llff_recenter", False):
        out["recenter"] = True
    v = getattr(scene_cfg, "llff_bd_rescale", 0.0)
    if v:
        out["bd_rescale"] = float(v)
    return out


def load_data(
    kind: str,
    name: str,
    root: str = "./data/nerf_synthetic",
    srgb_to_linear: bool = False,
    downscale: int = 1,
    splits=SPLITS,
    proc: Optional[Dict[str, int]] = None,
    llff: Optional[Dict[str, float]] = None,
) -> Dict[str, ImageDataset]:
    """Entry point mirroring reference load_data (data_loader.h:29-31).

    `proc` (scene_proc_kwargs) parameterizes procedural generation —
    image size, split view counts, GT quadrature — and is ignored for
    on-disk datasets.  `llff` (scene_llff_kwargs) parameterizes LLFF
    preprocessing (recenter / bd_rescale) and is ignored elsewhere."""
    if kind == "nerf_synthetic":
        return load_synthetic_scene(root, name, srgb_to_linear, downscale, splits)
    if kind == "llff":
        return load_llff_scene(
            root, name, srgb_to_linear=srgb_to_linear, downscale=downscale,
            **(llff or {}),
        )
    if kind == "colmap":
        from tnerf.data.colmap import load_colmap_scene

        return load_colmap_scene(
            root, name, srgb_to_linear=srgb_to_linear, downscale=downscale,
            **(llff or {}),
        )
    if kind == "procedural":
        from tnerf.data.procedural import generate_procedural_scene

        return generate_procedural_scene(name, **(proc or {}))
    raise ValueError(f"unknown dataset kind {kind!r}")


def validate_scene_background(kind: str, name: str, white_background: bool) -> None:
    """Procedural scenes ship 3-channel GT composited over their intrinsic
    background; a config that disagrees would silently train against wrong
    targets (the renderer would add the other background).  Raise early."""
    if kind != "procedural":
        return
    from tnerf.data.procedural import scene_background

    want = scene_background(name)
    if white_background != want:
        raise ValueError(
            f"procedural scene {name!r} has a {'white' if want else 'black'} "
            f"background baked into its GT images; set scene.white_background="
            f"{want} (and render.white_background to match)"
        )
