"""NDC ray parameterization (scene.ndc) — the forward-facing LLFF
warp (cameras.ndc_warp) plus its LLFF preprocessing prerequisites
(recenter_poses / bd_rescale) and the config validation + end-to-end
training path.

Oracle for the warp: the perspective projection itself.  A world point p
on a ray must project (via the camera intrinsics at the world origin) to
exactly the warped ray's point at the t' whose NDC z matches p — the
defining property of the NeRF appendix-C construction.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tnerf.cameras import (
    Rays,
    camera_rays,
    ndc_warp,
    pixel_rays,
    viewdirs_to_thetaphi,
)
from tnerf.config import Config
from tnerf.train_loop import ndc_near_or_none, resolve_near_far, validate_ndc

W, H = 32, 24
FX, FY = 40.0, 38.0


def _project(p, fx, fy, cx, cy, w, h):
    """NDC projection of world points [N, 3] (camera at origin, -z)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return np.stack(
        [
            (-fx * x / z + (cx - 0.5 * w)) / (0.5 * w),
            (-fy * y / z - (cy - 0.5 * h)) / (0.5 * h),
        ],
        axis=-1,
    )


def _forward_rays(n=64, seed=0):
    """Random forward-facing rays (d_z < 0) with origins near z=0."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3  # strictly forward
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(
        origins=jnp.asarray(o),
        directions=jnp.asarray(d),
        viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)),
    )


def test_ndc_projection_consistency():
    """For t' in [0, 1): the warped ray's point equals the perspective
    projection of the world point at the SAME depth — x/y from the
    pinhole model, z from 1 + 2*near/z_world."""
    near = 1.0
    rays = _forward_rays()
    cam = (FX, FY, 0.5 * W, 0.5 * H)
    wr = ndc_warp(rays, W, H, cam, near)
    o = np.asarray(rays.origins, np.float64)
    d = np.asarray(rays.directions, np.float64)
    wo = np.asarray(wr.origins, np.float64)
    wd = np.asarray(wr.directions, np.float64)
    for tp in (0.0, 0.1, 0.5, 0.9, 0.999):
        p_ndc = wo + tp * wd
        # invert the z map to find the world depth this t' represents
        z = 2.0 * near / (p_ndc[:, 2] - 1.0)  # z in (-inf, -near]
        # world point on the original ray at that depth
        tw = (z - o[:, 2]) / d[:, 2]
        p_w = o + tw[:, None] * d
        assert (tw > -1e-6).all()
        xy = _project(p_w, FX, FY, 0.5 * W, 0.5 * H, W, H)
        np.testing.assert_allclose(p_ndc[:, :2], xy, atol=5e-5)


def test_ndc_near_plane_and_infinity():
    near = 0.7
    rays = _forward_rays(seed=1)
    wr = ndc_warp(rays, W, H, (FX, FY, 0.5 * W, 0.5 * H), near)
    wo = np.asarray(wr.origins, np.float64)
    wd = np.asarray(wr.directions, np.float64)
    # t'=0 is the near plane: z_ndc = -1 exactly
    np.testing.assert_allclose(wo[:, 2], -1.0, atol=1e-6)
    # t'=1 is infinity: z_ndc = +1 exactly, and x/y equal the projection
    # of the ray's direction (the vanishing point)
    p1 = wo + wd
    np.testing.assert_allclose(p1[:, 2], 1.0, atol=1e-6)
    d = np.asarray(rays.directions, np.float64)
    vanish = _project(d, FX, FY, 0.5 * W, 0.5 * H, W, H)
    np.testing.assert_allclose(p1[:, :2], vanish, atol=5e-5)


def test_ndc_pixel_rays_map_to_pixel_columns():
    """A camera-center ray through pixel (i, j) projects to the same
    image point at every depth: the warped direction's x/y vanish and
    the origin sits at that pixel's NDC coordinate — including with an
    off-center principal point and anisotropic focal."""
    cam = (FX, FY, 0.4 * W, 0.6 * H)  # off-center on purpose
    pose = jnp.eye(4)
    rays = camera_rays(pose, W, H, cam)
    wr = ndc_warp(rays, W, H, cam, near=1.0)
    wo = np.asarray(wr.origins, np.float64)
    wd = np.asarray(wr.directions, np.float64)
    i = np.arange(W) + 0.5
    j = np.arange(H) + 0.5
    ii, jj = np.meshgrid(i, j, indexing="xy")
    np.testing.assert_allclose(wd[..., 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(wd[..., 1], 0.0, atol=1e-5)
    np.testing.assert_allclose(
        wo[..., 0], (ii - 0.5 * W) / (0.5 * W), atol=1e-5
    )
    np.testing.assert_allclose(
        wo[..., 1], (0.5 * H - jj) / (0.5 * H), atol=1e-5
    )


def test_ndc_preserves_viewdirs_and_is_direction_scale_invariant():
    rays = _forward_rays(seed=2)
    wr = ndc_warp(rays, W, H, FX, 1.0)
    np.testing.assert_array_equal(
        np.asarray(wr.viewdirs_tp), np.asarray(rays.viewdirs_tp)
    )
    scaled = Rays(
        origins=rays.origins,
        directions=rays.directions * 3.7,
        viewdirs_tp=rays.viewdirs_tp,
    )
    ws = ndc_warp(scaled, W, H, FX, 1.0)
    np.testing.assert_allclose(
        np.asarray(ws.origins), np.asarray(wr.origins), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ws.directions), np.asarray(wr.directions), atol=1e-5
    )


def test_ndc_frustum_lands_in_unit_cube():
    """All samples of all image rays along t' in [0, 1] stay inside
    [-1, 1]^3 (the grid AABB): the whole frustum fits the grid."""
    pose = jnp.eye(4)
    rays = camera_rays(pose, W, H, (FX, FY, 0.5 * W, 0.5 * H))
    wr = ndc_warp(rays, W, H, (FX, FY, 0.5 * W, 0.5 * H), 1.0)
    t = jnp.linspace(0.0, 1.0, 16)
    pts = np.asarray(
        wr.origins[..., None, :] + wr.directions[..., None, :] * t[:, None]
    )
    assert pts.min() >= -1.0 - 1e-5 and pts.max() <= 1.0 + 1e-5


def test_recenter_poses_identity_mean_frame():
    from tnerf.data.llff import poses_avg, recenter_poses
    from tnerf.data.procedural import frontal_poses

    poses = frontal_poses(12, seed=3).astype(np.float64)
    rec = recenter_poses(poses)
    avg = poses_avg(rec)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-6)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-6)
    # rigid: pairwise camera distances unchanged
    d0 = np.linalg.norm(
        poses[:, None, :3, 3] - poses[None, :, :3, 3], axis=-1
    )
    d1 = np.linalg.norm(rec[:, None, :3, 3] - rec[None, :, :3, 3], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-5)
    # content at the old origin now sits on -z of the new frame
    inv = np.linalg.inv(poses_avg(poses))
    origin_new = (inv @ np.array([0.0, 0.0, 0.0, 1.0]))[:3]
    assert origin_new[2] < 0


def test_llff_reader_recenter_and_bd_rescale(tmp_path):
    from tnerf.data.dataset import ImageDataset, load_data
    from tnerf.data.llff import poses_avg
    from tnerf.data.procedural import export_llff_format, frontal_poses

    rng = np.random.default_rng(5)
    n, w, h = 9, 16, 12
    ds = ImageDataset(
        images=rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32),
        poses=frontal_poses(n, seed=4).astype(np.float32), focal=20.0,
        width=w, height=h, channels=3, split="all",
    )
    export_llff_format(ds, str(tmp_path / "ff"), near=2.0, far=5.5)
    out = load_data(
        "llff", "ff", root=str(tmp_path),
        llff={"recenter": True, "bd_rescale": 0.75},
    )
    allp = np.concatenate([out["train"].poses, out["test"].poses])
    avg = poses_avg(allp.astype(np.float64))
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    # bd_rescale: min bound becomes exactly 1/0.75
    bounds = np.concatenate([out["train"].near_far, out["test"].near_far])
    np.testing.assert_allclose(bounds.min(), 1.0 / 0.75, rtol=1e-6)
    # rescale happens BEFORE recentering: camera spread scales by sc
    # (train split holds original indices 1..7 — every 8th is test)
    sc = 1.0 / (2.0 * 0.75)
    np.testing.assert_allclose(
        np.linalg.norm(allp[0, :3, 3] - allp[1, :3, 3]),
        sc * np.linalg.norm(ds.poses[1, :3, 3] - ds.poses[2, :3, 3]),
        rtol=1e-5,
    )


def _ndc_cfg(**over):
    base = [
        "scene.kind=llff", "scene.ndc=true", "scene.llff_recenter=true",
        "sampler.near=-1", "sampler.far=-1",
    ]
    return Config().apply_overrides(
        base + [f"{k}={v}" for k, v in over.items()]
    )


def test_validate_ndc_rejections():
    with pytest.raises(ValueError, match="forward-facing"):
        validate_ndc(_ndc_cfg(**{"scene.kind": "nerf_synthetic"}))
    with pytest.raises(ValueError, match="llff_recenter"):
        validate_ndc(_ndc_cfg(**{"scene.llff_recenter": "false"}))
    with pytest.raises(ValueError, match="mesh_path"):
        validate_ndc(_ndc_cfg(**{"grid.mesh_path": "x.obj"}))
    with pytest.raises(ValueError, match="ndc_near"):
        validate_ndc(_ndc_cfg(**{"scene.ndc_near": "0.0"}))
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        validate_ndc(_ndc_cfg(**{"sampler.near": "0.05", "sampler.far": "4.0"}))
    # valid combinations pass: auto and explicit (0, 1)
    validate_ndc(_ndc_cfg())
    validate_ndc(_ndc_cfg(**{"sampler.near": "0.0", "sampler.far": "1.0"}))
    # procedural forward-facing scenes are allowed without llff knobs
    validate_ndc(
        Config().apply_overrides([
            "scene.kind=procedural", "scene.ndc=true",
            "sampler.near=-1", "sampler.far=-1",
        ])
    )


def test_resolve_near_far_under_ndc():
    cfg = _ndc_cfg()
    r = resolve_near_far(cfg, None)  # dataset unused on the ndc branch
    assert (r.sampler.near, r.sampler.far) == (0.0, 1.0)
    assert ndc_near_or_none(r) == 1.0
    assert ndc_near_or_none(Config()) is None


def test_pixel_sampler_emits_warped_rays(tmp_path):
    """PixelSampler(ndc_near=...) rays equal the manual pixel_rays +
    ndc_warp composition and stay inside the grid cube over t' in
    [0, 1]."""
    import jax

    from tnerf.data.dataset import ImageDataset
    from tnerf.data.procedural import frontal_poses
    from tnerf.train import PixelSampler

    rng = np.random.default_rng(9)
    n, w, h = 4, 16, 12
    ds = ImageDataset(
        images=rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32),
        poses=frontal_poses(n, seed=6).astype(np.float32), focal=20.0,
        width=w, height=h, channels=3, split="train",
    )
    from tnerf.data.llff import recenter_poses

    ds = dataclasses.replace(ds, poses=recenter_poses(ds.poses))
    s = PixelSampler(ds, 1.0, True, ndc_near=1.0)
    batch = s.sample(jax.random.PRNGKey(0), 64)
    meta = s.sample(jax.random.PRNGKey(0), 64, meta=True)
    manual = ndc_warp(
        pixel_rays(s.poses[meta.img], meta.pix, w, h, s.camera, 1.0),
        w, h, s.camera, 1.0,
    )
    np.testing.assert_allclose(
        np.asarray(batch.rays.origins), np.asarray(manual.origins), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(batch.rays.directions), np.asarray(manual.directions),
        atol=1e-6,
    )
    # regen_rays (the occupancy capacity probe path) agrees too
    regen = s.regen_rays(meta)
    np.testing.assert_allclose(
        np.asarray(regen.origins), np.asarray(batch.rays.origins), atol=1e-6
    )
    # z spans the cube exactly; x/y may crop at the cube faces for
    # off-axis cameras (only the MEAN frustum maps exactly to [-1,1]^2 —
    # standard NDC edge behavior, see test_ndc_frustum_lands_in_unit_cube)
    pts = np.asarray(
        batch.rays.origins[:, None, :]
        + batch.rays.directions[:, None, :]
        * jnp.linspace(0, 1, 8)[:, None]
    )
    np.testing.assert_allclose(pts[..., 2].min(), -1.0, atol=1e-5)
    np.testing.assert_allclose(pts[..., 2].max(), 1.0, atol=1e-5)


def test_ndc_end_to_end_training(tmp_path):
    """Full path: forward-facing procedural pool -> LLFF export -> real
    reader with recenter + bd_rescale -> NDC training (grid_march) ->
    eval.  The field learns in warped space; PSNR must clear a sanity
    floor on the held-out view."""
    from tnerf.data.procedural import export_llff_format, generate_llff_pool
    from tnerf.train_loop import run_training

    pool = generate_llff_pool(
        width=24, height=18, n_views=6, n_samples=48, near=2.0, far=5.5,
    )
    export_llff_format(pool, str(tmp_path / "ff"), near=2.0, far=5.5)
    cfg = Config().apply_overrides([
        "scene.kind=llff", "scene.name=ff", f"scene.root={tmp_path}",
        "scene.scene_scale=1.0", "scene.ndc=true",
        "scene.llff_recenter=true", "scene.llff_bd_rescale=0.75",
        "sampler.near=-1", "sampler.far=-1",
        "render.pipeline=grid_march", "sampler.samples_per_ray=32",
        "sampler.tighten_res=8", "sampler.occupancy_mask_res=8",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "grid.resolution=16", "grid.warmup_steps=1000",
        "train.batch_size=216", "train.steps=250", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=100",
        "train.lr=5e-3",
        f"logging.out_dir={tmp_path / 'run'}", "render.chunk_size=432",
    ])
    m = run_training(cfg)
    assert np.isfinite(m["psnr_test"])
    # white-bg pool at tiny res: untrained renders sit ~8-10 dB; a field
    # that actually learns in NDC space clears this comfortably
    assert m["psnr_test"] > 14.0, m
