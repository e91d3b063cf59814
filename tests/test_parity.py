"""Render-parity gate (BASELINE north star: within 0.5 dB PSNR of a
*correct* CUDA-style reference render — SURVEY §7.3 item 5 pins the
oracle as standard NeRF quadrature with the reference's defects excluded).

The analytic procedural field is the scene; the oracle render is dense
uniform marching at high sample count (tnerf.data.procedural, the same
math as original-NeRF quadrature).  The framework render under test is
the full grid pipeline (traversal -> interval sampling -> composite)
evaluating the SAME analytic field — so any PSNR gap is pipeline error
(quadrature, traversal, masking), not model error."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.cameras import camera_rays, focal_from_angle
from tnerf.config import Config
from tnerf.data.procedural import (
    CAMERA_ANGLE_X,
    _render_gt_image,
    analytic_field,
    sphere_poses,
)
from tnerf.grid.traversal import traverse_grid
from tnerf.render.composite import composite
from tnerf.sampling import interval_samples, sample_positions
from tnerf.train import psnr


@pytest.mark.parametrize("grid_res,spi,min_db", [(8, 32, 30.0), (16, 16, 30.0)])
def test_grid_pipeline_within_half_db_family(grid_res, spi, min_db):
    W = H = 64
    near, far = 2.0, 5.5
    focal = focal_from_angle(W, CAMERA_ANGLE_X)
    pose = jnp.asarray(sphere_poses(1, radius=3.5, seed=7)[0])

    # oracle: dense 512-sample uniform quadrature of the analytic field
    oracle = np.asarray(
        _render_gt_image(pose, W, H, focal, near, far, 512, True)
    )

    # framework pipeline: reference-shaped traversal + 32/interval
    cfg = Config().apply_overrides([f"grid.resolution={grid_res}"])
    rays = camera_rays(pose, W, H, focal)
    o = rays.origins.reshape(-1, 3)
    d = rays.directions.reshape(-1, 3)
    iv = traverse_grid(o, d, cfg.grid)
    s = interval_samples(iv.t_starts, iv.t_ends, iv.mask, spi)
    pts = sample_positions(o, d, s.t)
    rgb, sigma = analytic_field(pts)
    res = composite(rgb, sigma, s.deltas, t_mid=s.t, mask=s.mask,
                    white_background=True)
    img = np.asarray(res.rgb).reshape(H, W, 3)

    db = psnr(img, oracle)
    assert db > min_db, f"grid pipeline vs oracle: {db:.2f} dB"


def test_march_pipeline_parity():
    """The march (fast) path must agree with the oracle too."""
    from tnerf.grid.traversal import march_samples_t, ray_aabb

    W = H = 64
    near, far = 2.0, 5.5
    focal = focal_from_angle(W, CAMERA_ANGLE_X)
    pose = jnp.asarray(sphere_poses(1, radius=3.5, seed=8)[0])
    oracle = np.asarray(
        _render_gt_image(pose, W, H, focal, near, far, 512, True)
    )
    cfg = Config()
    rays = camera_rays(pose, W, H, focal)
    o = rays.origins.reshape(-1, 3)
    d = rays.directions.reshape(-1, 3)
    te, tx = ray_aabb(o, d, cfg.grid.aabb_min, cfg.grid.aabb_max)
    te = jnp.maximum(te, near)
    tx = jnp.maximum(tx, te)
    t, deltas = march_samples_t(te, tx, 256)
    pts = sample_positions(o, d, t)
    rgb, sigma = analytic_field(pts)
    res = composite(rgb, sigma, deltas, t_mid=t,
                    mask=(tx > te)[:, None] & jnp.ones(t.shape, bool),
                    white_background=True)
    img = np.asarray(res.rgb).reshape(H, W, 3)
    db = psnr(img, oracle)
    assert db > 32.0, f"march pipeline vs oracle: {db:.2f} dB"
