"""instant-ngp-style random-background alpha supervision
(train.random_background).

The property test uses a WHITE sphere on a WHITE eval background: the
composited GT images are nearly uniform white, so nothing but the GT
alpha channel (composited over per-ray random colors) can teach the
network where the object is.  A correct implementation produces an
opacity map matching the sphere silhouette; a broken one (background
painted as geometry, or mismatched GT/pred compositing) cannot.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.cameras import camera_rays
from tnerf.config import Config
from tnerf.data.dataset import ImageDataset
from tnerf.data.procedural import sphere_poses

W, H, FOCAL = 24, 24, 26.0
RADIUS = 0.6


def _silhouette(pose):
    """Analytic alpha of a centered sphere from one camera."""
    rays = camera_rays(jnp.asarray(pose), W, H, FOCAL)
    o = np.asarray(rays.origins, np.float64)
    d = np.asarray(rays.directions, np.float64)
    b = np.sum(d * o, axis=-1)
    disc = b * b - (np.sum(o * o, axis=-1) - RADIUS * RADIUS)
    return (disc > 0).astype(np.float32)


def _sphere_rgba_dataset(n_views, split, seed=0):
    poses = sphere_poses(n_views, radius=3.0, seed=seed).astype(np.float32)
    imgs = []
    for p in poses:
        a = _silhouette(p)
        rgba = np.ones((H, W, 4), np.float32)
        rgba[..., 3] = a
        imgs.append(rgba)
    return ImageDataset(
        images=np.stack(imgs), poses=poses, focal=FOCAL,
        width=W, height=H, channels=4, split=split,
    )


def test_pixel_sampler_keeps_alpha():
    from tnerf.train import PixelSampler

    ds = _sphere_rgba_dataset(2, "train")
    s = PixelSampler(ds, 1.0, True, random_background=True)
    batch = s.sample(jax.random.PRNGKey(0), 32)
    assert batch.gt_rgb.shape == (32, 4)
    a = np.asarray(batch.gt_rgb[:, 3])
    assert set(np.unique(a)).issubset({0.0, 1.0})
    # without the flag, a 4-channel dataset is composited to 3 channels
    s3 = PixelSampler(ds, 1.0, True)
    assert s3.sample(jax.random.PRNGKey(0), 32).gt_rgb.shape == (32, 3)
    # 3-channel datasets reject the flag
    ds3 = dataclasses.replace(ds, images=ds.images[..., :3], channels=3)
    with pytest.raises(ValueError, match="alpha"):
        PixelSampler(ds3, 1.0, True, random_background=True)


def test_random_background_learns_white_on_white_silhouette(tmp_path):
    from tnerf.eval import render_dataset_view_result
    from tnerf.train_loop import build_field, build_renderer, run_training

    datasets = {
        "train": _sphere_rgba_dataset(6, "train", seed=0),
        "test": _sphere_rgba_dataset(2, "test", seed=9),
    }
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.name=prims",  # data passed directly
        "scene.scene_scale=1.0", "scene.white_background=true",
        "render.white_background=true",
        "render.pipeline=grid_march", "render.compact=false",
        "sampler.samples_per_ray=32", "sampler.near=1.5", "sampler.far=4.5",
        "sampler.mode=stratified",
        "sampler.tighten_res=8", "sampler.occupancy_mask_res=8",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "grid.resolution=16", "grid.warmup_steps=64",
        "train.batch_size=512", "train.steps=300", "train.eval_every=0",
        "train.checkpoint_every=300", "train.log_every=100",
        "train.lr=5e-3", "train.random_background=true",
        f"logging.out_dir={tmp_path / 'run'}", "render.chunk_size=576",
    ])
    m = run_training(cfg, datasets=datasets)
    # PSNR vs the white-composited GT (nearly uniform white images —
    # achievable only if free space stays empty)
    assert m["psnr_test"] > 20.0, m

    # The decisive check: the learned OPACITY matches the silhouette.
    field = build_field(cfg)
    renderer = build_renderer(cfg, field, for_eval=True)
    from tnerf.grid.occupancy import init_occupancy, renderer_payload
    from tnerf.utils.checkpoint import restore_checkpoint
    from tnerf.train import create_optimizer, init_train_state

    template = (
        init_train_state(field, create_optimizer(cfg.train), cfg.train.seed),
        init_occupancy(cfg.grid),
    )
    step, (state, occ) = restore_checkpoint(
        str(tmp_path / "run" / "checkpoints"), template
    )
    res = render_dataset_view_result(
        renderer, state.params, datasets["test"], 0, 1.0,
        occupancy=renderer_payload(occ, cfg.sampler, cfg.grid),
    )
    sil = _silhouette(datasets["test"].poses[0])
    acc = np.asarray(res.acc)
    # erode the silhouette edge: quadrature blur at 24x24 is expected
    inside = sil > 0.5
    outside = sil < 0.5
    # shrink both regions by ignoring pixels adjacent to the boundary
    from scipy import ndimage

    core = ndimage.binary_erosion(inside, iterations=2)
    bg = ndimage.binary_erosion(outside, iterations=2)
    assert core.sum() > 10 and bg.sum() > 50
    assert acc[core].mean() > 0.85, acc[core].mean()
    assert acc[bg].mean() < 0.10, acc[bg].mean()


def test_random_background_requires_alpha_dataset(tmp_path):
    from tnerf.train_loop import run_training

    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.name=prims",
        "scene.proc_width=8", "scene.proc_height=8",
        "scene.proc_n_train=1", "scene.proc_n_test=1", "scene.proc_n_val=1",
        "scene.proc_n_samples=16",
        "train.random_background=true", "train.steps=2",
        "train.batch_size=16", "train.eval_every=0",
        "train.checkpoint_every=0",
        "render.pipeline=uniform", "sampler.samples_per_ray=4",
        "field_.hidden_width=8", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        f"logging.out_dir={tmp_path / 'run'}",
    ])
    with pytest.raises(ValueError, match="alpha"):
        run_training(cfg)
