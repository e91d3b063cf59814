"""Density-weighted CDF sample placement (sampler.placement="density_cdf").

The hierarchical-importance role of the classic NeRF coarse pass
(coarse network -> fine samples) rebuilt TPU-first: the "coarse density"
is the occupancy grid's density EMA — already maintained by
update_occupancy — so placement costs zero field evaluations, and the
weights are transmittance-scaled per-bin alphas (bins behind an opaque
surface get almost no budget, unlike occupancy_cdf's equal per-occupied-
bin weighting).  The quadrature stays unbiased: deltas are the warp's
point Jacobian and compositing re-derives exact transmittance, so
placement only steers WHERE the budget goes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnerf.cameras import Rays, viewdirs_to_thetaphi
from tnerf.config import Config
from tnerf.fields.nerf_field import NeRFField
from tnerf.grid.occupancy import OccupancyGridState, renderer_payload
from tnerf.render.grid_renderer import (
    cdf_bin_weights,
    cdf_occupied_sample_fraction,
    make_grid_renderer,
    split_occupancy_payload,
)
from tnerf.sampling import cdf_ray_samples


def _z_rays(n, z0=-3.0, spread=0.5, seed=0):
    rng = np.random.default_rng(seed)
    o = np.stack([rng.uniform(-spread, spread, n),
                  rng.uniform(-spread, spread, n),
                  np.full(n, z0)], -1).astype(np.float32)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
    return Rays(origins=jnp.asarray(o), directions=jnp.asarray(d),
                viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)))


def _slab_density(res, lo, hi, sigma, base=None):
    d = np.zeros((res, res, res), np.float32) if base is None else base
    d[:, :, lo:hi] = sigma
    return d


def test_low_density_limit_matches_occupancy_cdf():
    """As sigma -> 0 in every occupied cell, T ~= 1 and per-bin alpha is
    ~constant across support bins, so (after the per-ray rescale to
    binary parity) the density weights equal the binary occupancy
    weights and the placed samples coincide."""
    cfg = Config().apply_overrides([
        "grid.resolution=16", "sampler.cdf_bins=32",
        "sampler.occupancy_mask_res=16", "sampler.samples_per_ray=16",
    ])
    res = 16
    dens = _slab_density(res, 8, 10, 1e-4)
    occ3 = jnp.asarray(dens > 0)
    rays = _z_rays(8)
    o, d = rays.origins, rays.directions
    t0 = jnp.full((8,), 2.0, jnp.float32)
    t1 = jnp.full((8,), 4.0, jnp.float32)

    c_occ = cfg.apply_overrides(["sampler.placement=occupancy_cdf"])
    c_den = cfg.apply_overrides(["sampler.placement=density_cdf"])
    w_o, s_o = cdf_bin_weights(o, d, t0, t1, occ3, None,
                               cfg.grid, c_occ.sampler)
    # support for density path = sigma > threshold; use threshold below
    # 1e-4 so it matches the occupancy bits above
    import dataclasses
    grid_lo = dataclasses.replace(cfg.grid, density_threshold=1e-6)
    w_d, s_d = cdf_bin_weights(o, d, t0, t1, occ3, jnp.asarray(dens),
                               grid_lo, c_den.sampler)
    np.testing.assert_array_equal(np.asarray(s_o), np.asarray(s_d))
    np.testing.assert_allclose(np.asarray(w_o), np.asarray(w_d),
                               atol=1e-3)
    a = cdf_ray_samples(t0, t1, 16, w_o, bin_support=s_o)
    b = cdf_ray_samples(t0, t1, 16, w_d, bin_support=s_d)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.deltas), np.asarray(b.deltas),
                               rtol=1e-2)


def test_occluded_slab_gets_starved_but_stays_in_support():
    """Two occupied slabs; the first is opaque.  density_cdf must place
    far fewer samples in the occluded second slab than occupancy_cdf
    (which weights both equally), while keeping the second slab's bins
    in SUPPORT so any samples that do land there composite normally."""
    cfg = Config().apply_overrides([
        "grid.resolution=16", "sampler.cdf_bins=64",
        "sampler.occupancy_mask_res=16", "sampler.samples_per_ray=32",
        "sampler.cdf_floor=0.01",
    ])
    res = 16
    dens = _slab_density(res, 4, 6, 200.0)          # opaque wall
    dens = _slab_density(res, 10, 12, 5.0, dens)    # occluded content
    occ3 = jnp.asarray(dens) > cfg.grid.density_threshold
    n = 16
    rays = _z_rays(n, spread=0.3)
    o, d = rays.origins, rays.directions
    t0 = jnp.full((n,), 2.0, jnp.float32)
    t1 = jnp.full((n,), 4.0, jnp.float32)

    # z extents of the second slab in t units (rays start z0=-3, dir +z)
    # cell z in [10,12) of res 16 over [-1,1]: z in [0.25, 0.5] -> t in
    # [3.25, 3.5]
    def count_in_second(t, m):
        return float(jnp.sum(((t >= 3.25) & (t <= 3.5)) & m))

    counts = {}
    for placement in ("occupancy_cdf", "density_cdf"):
        c = cfg.apply_overrides([f"sampler.placement={placement}"])
        dens_m = jnp.asarray(dens) if placement == "density_cdf" else None
        w, s = cdf_bin_weights(o, d, t0, t1, occ3, dens_m, cfg.grid,
                               c.sampler)
        smp = cdf_ray_samples(t0, t1, 32, w, floor=c.sampler.cdf_floor,
                              bin_support=s)
        counts[placement] = count_in_second(smp.t, smp.mask)
        # unmasked samples only land inside support bins (slab extents
        # padded by one bin width: support is probed at BIN midpoints,
        # so an edge bin's samples can sit up to half a bin outside)
        pad = 2.0 / 64 + 1e-6
        in_support_t = (
            (smp.t >= 2.5 - pad) & (smp.t <= 2.75 + pad)
        ) | ((smp.t >= 3.25 - pad) & (smp.t <= 3.5 + pad))
        assert bool(jnp.all(~smp.mask | in_support_t))
    # occupancy_cdf splits the budget ~half/half; density_cdf starves
    # the occluded slab
    assert counts["density_cdf"] < 0.25 * counts["occupancy_cdf"], counts
    # the first (visible) slab keeps plenty
    assert counts["occupancy_cdf"] > 0


def test_planner_matches_measured_sample_fraction():
    """cdf_occupied_sample_fraction must equal the measured fraction of
    in-support samples the renderer's placement actually produces (the
    shared cdf_bin_weights makes drift structurally impossible; this
    guards the pmf/stratification algebra around it)."""
    cfg = Config().apply_overrides([
        "grid.resolution=16", "sampler.cdf_bins=32",
        "sampler.occupancy_mask_res=16", "sampler.tighten=false",
        "sampler.samples_per_ray=64", "sampler.placement=density_cdf",
        "sampler.near=0.05",
    ])
    res = 16
    dens = _slab_density(res, 4, 6, 50.0)
    dens = _slab_density(res, 10, 13, 2.0, dens)
    n = 32
    rays = _z_rays(n, spread=0.8, seed=3)
    payload = jnp.asarray(dens)
    planned = float(cdf_occupied_sample_fraction(
        rays, payload, cfg.grid, cfg.sampler
    ))
    # measure: place with the same (untightened) span
    from tnerf.grid.traversal import ray_aabb
    o, d = rays.origins, rays.directions
    te, tx = ray_aabb(o, d, cfg.grid.aabb_min, cfg.grid.aabb_max)
    te = jnp.maximum(te, cfg.sampler.near)
    tx = jnp.maximum(tx, te)
    occ3, dens3 = split_occupancy_payload(payload, cfg.grid)
    w, s = cdf_bin_weights(o, d, te, tx, occ3, dens3, cfg.grid, cfg.sampler)
    smp = cdf_ray_samples(te, tx, 64, w, floor=cfg.sampler.cdf_floor,
                          bin_support=s)
    measured = float(jnp.mean(smp.mask.astype(jnp.float32)))
    # stratified placement realizes the expectation up to one boundary
    # sample per support run per ray
    np.testing.assert_allclose(planned, measured, atol=0.03)


def test_renderer_rejects_bool_payload_for_density_cdf():
    cfg = Config().apply_overrides([
        "grid.resolution=8", "sampler.placement=density_cdf",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2", "sampler.samples_per_ray=8",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rays = _z_rays(4)
    r = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                           strategy="march", compact=False)
    with pytest.raises(ValueError, match="density_cdf"):
        r(params, rays, None, jnp.ones((8, 8, 8), bool))


def test_payload_dispatch_roundtrip():
    cfg = Config().apply_overrides(["grid.resolution=8"])
    dens = jnp.asarray(_slab_density(8, 2, 4, 7.0))
    occ = OccupancyGridState(
        density_ema=dens, bitfield=dens > cfg.grid.density_threshold,
        step=jnp.int32(1),
    )
    c_u = cfg.apply_overrides(["sampler.placement=uniform"])
    c_d = cfg.apply_overrides(["sampler.placement=density_cdf"])
    p_u = renderer_payload(occ, c_u.sampler, cfg.grid)
    p_d = renderer_payload(occ, c_d.sampler, cfg.grid)
    assert p_u.dtype == jnp.bool_
    assert p_d.dtype == jnp.float32
    assert renderer_payload(None, c_d.sampler, cfg.grid) is None
    # split derives the exact update_occupancy bitfield from the EMA
    bits_u, dens_u = split_occupancy_payload(p_u, cfg.grid)
    bits_d, dens_d = split_occupancy_payload(p_d, cfg.grid)
    assert dens_u is None and dens_d is not None
    np.testing.assert_array_equal(np.asarray(bits_u), np.asarray(bits_d))
    np.testing.assert_array_equal(np.asarray(bits_d),
                                  np.asarray(occ.bitfield))


def test_density_cdf_render_matches_fine_uniform_quadrature():
    """Placement must not bias the integral: a density_cdf render at
    S=24 agrees with a dense uniform render at S=256 of the same field
    (the same check that validated occupancy_cdf; the transmittance
    weighting changes only WHERE samples go)."""
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4", "sampler.near=0.05",
        "grid.resolution=16", "sampler.tighten_res=8",
        "sampler.occupancy_mask_res=16", "sampler.cdf_bins=32",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    res = 16
    # the field is smooth and nonzero everywhere; a fat density slab
    # with a fully-dense mask keeps the comparison apples-to-apples
    # (mild EMA density -> mild warp; the FIELD being integrated is the
    # random MLP either way, the grid only steers placement)
    dens = _slab_density(res, 2, 14, 1.0)
    payload = jnp.asarray(dens)
    occ_all = jnp.asarray(dens > 0)
    n = 32
    rays = _z_rays(n, spread=0.4, seed=5)

    c_ref = cfg.apply_overrides([
        "sampler.placement=uniform", "sampler.samples_per_ray=256",
    ])
    r_ref = make_grid_renderer(field, c_ref.grid, c_ref.sampler,
                               c_ref.render, strategy="march", compact=False)
    ref = r_ref(params, rays, None, occ_all)

    c_cdf = cfg.apply_overrides([
        "sampler.placement=density_cdf", "sampler.samples_per_ray=24",
    ])
    r_cdf = make_grid_renderer(field, c_cdf.grid, c_cdf.sampler,
                               c_cdf.render, strategy="march", compact=False)
    out = r_cdf(params, rays, None, payload)
    assert np.all(np.isfinite(np.asarray(out.rgb)))
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=0.05)


def test_density_cdf_jittered_path_near_midpoint():
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4", "sampler.samples_per_ray=16",
        "sampler.near=0.05", "grid.resolution=16",
        "sampler.tighten_res=8", "sampler.occupancy_mask_res=16",
        "sampler.placement=density_cdf", "sampler.cdf_bins=32",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    dens = _slab_density(16, 8, 10, 8.0)
    payload = jnp.asarray(dens)
    rays = _z_rays(32, seed=2)
    r = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                           strategy="march", compact=False)
    out_j = np.asarray(r(params, rays, jax.random.PRNGKey(7), payload).rgb)
    out_m = np.asarray(r(params, rays, None, payload).rgb)
    assert np.all(np.isfinite(out_j))
    assert np.abs(out_j - out_m).mean() < 0.05


def test_run_training_density_cdf_data_parallel(tmp_path):
    """density_cdf composes with DP: the f32 density-EMA payload rides the
    sharded train step (replicated, like the bitfield) and the planner
    switch runs on sharded batches — on the 8-device CPU mesh."""
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    assert len(jax.devices()) >= 8
    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march", "parallel.data_parallel=8",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "sampler.placement=density_cdf", "sampler.cdf_bins=32",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=256", "train.steps=20", "train.eval_every=10",
        "train.checkpoint_every=0", "train.log_every=10",
        f"logging.out_dir={tmp_path / 'dp_dcdf'}",
        "render.chunk_size=1024",
    ])
    metrics = run_training(cfg, datasets=scene)
    assert "psnr_test" in metrics and np.isfinite(metrics["psnr_test"])


def test_run_training_density_cdf(tmp_path):
    """run_training end-to-end with density_cdf placement: exercises
    renderer_payload through the train step, the capacity planner switch
    and eval (quadrature contract: train and eval share the placement)."""
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "sampler.placement=density_cdf", "sampler.cdf_bins=32",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=256", "train.steps=40", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=10",
        f"logging.out_dir={tmp_path / 'run'}",
        "render.chunk_size=1024",
    ])
    metrics = run_training(cfg, datasets=scene)
    assert "psnr_test" in metrics and np.isfinite(metrics["psnr_test"])


def test_renderer_payload_dense_start_is_all_occupied():
    """Before the first occupancy update (state.step == 0) the f32
    payload must derive an all-occupied bitfield: deriving bits from the
    raw all-zero init EMA would mask EVERY sample and zero the training
    gradient for the whole grid.warmup_steps window (regression: round-3
    self-review finding)."""
    from tnerf.grid.occupancy import init_occupancy

    cfg = Config().apply_overrides([
        "grid.resolution=8", "sampler.placement=density_cdf",
    ])
    occ0 = init_occupancy(cfg.grid)
    p0 = renderer_payload(occ0, cfg.sampler, cfg.grid)
    assert p0.dtype == jnp.float32
    bits0, dens0 = split_occupancy_payload(p0, cfg.grid)
    assert bool(jnp.all(bits0)), "dense start must derive all-occupied"
    assert dens0 is not None
    # after the first update the payload is the real EMA again — an
    # all-zero EMA now legitimately derives an empty bitfield
    occ1 = occ0._replace(step=jnp.int32(1))
    bits1, _ = split_occupancy_payload(
        renderer_payload(occ1, cfg.sampler, cfg.grid), cfg.grid
    )
    assert not bool(jnp.any(bits1))


def test_density_cdf_warmup_gradient_nonzero():
    """End-to-end repro of the warmup zero-grad bug: grad of the render
    loss w.r.t. field params through the init-state payload must be
    nonzero under density_cdf placement (it was exactly 0.0 before the
    dense-start fix)."""
    from tnerf.grid.occupancy import init_occupancy

    cfg = Config().apply_overrides([
        "grid.resolution=8", "sampler.placement=density_cdf",
        "sampler.samples_per_ray=16", "sampler.cdf_bins=16",
        "sampler.near=0.05",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rays = _z_rays(8)
    render = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                                strategy="march", compact=False)
    payload = renderer_payload(init_occupancy(cfg.grid), cfg.sampler,
                               cfg.grid)

    def loss(p):
        return jnp.mean(render(p, rays, None, payload).rgb ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert total > 0.0
