"""Sampler tests: regular spacing exactness, stratified bounds, working
per-ray RNG (defect D10 regression) — SURVEY §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnerf.sampling import interval_samples, sample_positions, uniform_ray_samples


def test_regular_uniform_samples_are_midpoints():
    s = uniform_ray_samples(1.0, 3.0, 4, (2,), mode="regular")
    expect = np.array([1.25, 1.75, 2.25, 2.75])
    np.testing.assert_allclose(np.asarray(s.t[0]), expect, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.deltas), 0.5, atol=1e-6)


def test_stratified_stays_in_strata_and_differs_per_ray():
    key = jax.random.PRNGKey(0)
    s = uniform_ray_samples(0.0, 1.0, 8, (16,), mode="stratified", key=key)
    t = np.asarray(s.t)
    edges = np.linspace(0, 1, 9)
    for i in range(8):
        assert np.all(t[:, i] >= edges[i]) and np.all(t[:, i] <= edges[i + 1])
    # D10 regression: rays must NOT draw identical randoms
    assert np.abs(t[0] - t[1]).max() > 1e-4


def test_uniform_mode_sorted():
    key = jax.random.PRNGKey(1)
    s = uniform_ray_samples(2.0, 6.0, 32, (4,), mode="uniform", key=key)
    t = np.asarray(s.t)
    assert np.all(np.diff(t, axis=-1) >= 0)
    assert t.min() >= 2.0 and t.max() <= 6.0


def test_interval_samples_regular_layout():
    # 2 intervals on one ray: [1,2) and [3,3.5)
    t0 = jnp.asarray([[1.0, 3.0]])
    t1 = jnp.asarray([[2.0, 3.5]])
    mask = jnp.asarray([[True, True]])
    s = interval_samples(t0, t1, mask, samples_per_interval=4, mode="regular")
    assert s.t.shape == (1, 8)
    expect0 = 1.0 + (np.arange(4) + 0.5) / 4 * 1.0
    expect1 = 3.0 + (np.arange(4) + 0.5) / 4 * 0.5
    np.testing.assert_allclose(np.asarray(s.t[0, :4]), expect0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.t[0, 4:]), expect1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.deltas[0, :4]), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.deltas[0, 4:]), 0.125, atol=1e-6)
    # monotone t across intervals (defect D5 regression)
    assert np.all(np.diff(np.asarray(s.t[0])) > 0)


def test_interval_samples_mask_propagates():
    t0 = jnp.asarray([[1.0, 0.0]])
    t1 = jnp.asarray([[2.0, 0.0]])
    mask = jnp.asarray([[True, False]])
    s = interval_samples(t0, t1, mask, 4)
    m = np.asarray(s.mask[0])
    assert m[:4].all() and not m[4:].any()


def test_interval_stratified_within_interval():
    key = jax.random.PRNGKey(2)
    t0 = jnp.zeros((8, 1))
    t1 = jnp.ones((8, 1))
    mask = jnp.ones((8, 1), bool)
    s = interval_samples(t0, t1, mask, 16, mode="stratified", key=key)
    t = np.asarray(s.t)
    assert t.min() >= 0 and t.max() <= 1
    # stratified: sample i in stratum i
    for i in range(16):
        assert np.all(t[:, i] >= i / 16) and np.all(t[:, i] <= (i + 1) / 16)
    assert np.abs(t[0] - t[1]).max() > 1e-4  # D10


def test_bad_mode_raises():
    with pytest.raises(ValueError):
        uniform_ray_samples(0, 1, 4, (1,), mode="bogus")


def test_sample_positions_shape():
    o = jnp.zeros((5, 3))
    d = jnp.asarray([[1.0, 0, 0]] * 5)
    t = jnp.broadcast_to(jnp.arange(4.0), (5, 4))
    p = sample_positions(o, d, t)
    assert p.shape == (5, 4, 3)
    np.testing.assert_allclose(np.asarray(p[0, :, 0]), [0, 1, 2, 3], atol=1e-6)


# ---- occupancy-CDF placement (sampler.placement="occupancy_cdf") ----

def test_cdf_constant_weights_reduces_to_uniform_march():
    from tnerf.grid.traversal import march_samples_t
    from tnerf.sampling import cdf_ray_samples

    t0 = jnp.asarray([0.5, 1.0, 2.0])
    t1 = jnp.asarray([2.5, 1.0, 6.0])  # includes an empty span
    S = 16
    w = jnp.ones((3, 32))
    s = cdf_ray_samples(t0, t1, S, w, floor=0.01)
    t_ref, d_ref = march_samples_t(t0, t1, S)
    np.testing.assert_allclose(np.asarray(s.t), np.asarray(t_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s.deltas), np.asarray(d_ref), atol=2e-5)
    assert not bool(s.mask[1].any())  # empty span masked


def test_cdf_concentrates_on_occupied_bins():
    from tnerf.sampling import cdf_ray_samples

    P, S = 64, 32
    t0, t1 = jnp.asarray([1.0]), jnp.asarray([3.0])
    w = jnp.zeros((1, P)).at[0, 40].set(1.0)  # one occupied bin
    s = cdf_ray_samples(t0, t1, S, w, floor=0.01)
    t = np.asarray(s.t[0])
    lo = 1.0 + 40 / P * 2.0
    hi = 1.0 + 41 / P * 2.0
    inside = (t >= lo) & (t <= hi)
    # with floor=0.01 and one unit bin: occupied mass 1.01/1.64 = 0.61
    # -> >= half the samples must land inside the single occupied bin
    assert inside.mean() >= 0.5, inside.mean()
    # point-Jacobian quadrature: the samples inside the occupied bin
    # tile exactly that bin's t-width (each carries delta =
    # (span/P)/(pmf*S), and there are ~pmf*S of them)
    d = np.asarray(s.deltas[0])
    bin_width = 2.0 / P
    np.testing.assert_allclose(
        d[inside].sum(), bin_width, rtol=2.0 / max(inside.sum(), 1)
    )
    assert np.all(d > 0)
    assert np.all(np.diff(t) > -1e-6)  # monotone
    # support masking: floor-placed samples in empty bins are masked,
    # in-bin samples are not
    m = np.asarray(s.mask[0])
    assert m[inside].all() and not m[~inside].any()


def test_cdf_jittered_points_monotone_and_midpoint_consistent():
    from tnerf.sampling import cdf_ray_samples

    P, S, B = 16, 8, 4
    key = jax.random.PRNGKey(3)
    t0 = jnp.zeros((B,))
    t1 = jnp.full((B,), 4.0)
    w = jax.random.uniform(jax.random.PRNGKey(4), (B, P))
    jit = jax.random.uniform(key, (B, S))
    s = cdf_ray_samples(t0, t1, S, w, floor=0.05, jitter=jit)
    t = np.asarray(s.t)
    assert np.all(np.diff(t, axis=1) > -1e-6)  # strata keep t monotone
    assert np.all((t >= 0) & (t <= 4.0))
    # jitter=0.5 IS the midpoint call
    s_half = cdf_ray_samples(
        t0, t1, S, w, floor=0.05, jitter=jnp.full((B, S), 0.5)
    )
    s_mid = cdf_ray_samples(t0, t1, S, w, floor=0.05)
    np.testing.assert_allclose(
        np.asarray(s_half.t), np.asarray(s_mid.t), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_half.deltas), np.asarray(s_mid.deltas), atol=1e-6
    )


def test_renderer_cdf_placement_matches_uniform_when_grid_dense():
    """With every cell occupied the CDF warp is the identity, so the
    occupancy_cdf march render must equal the uniform one through the
    full renderer (incl. ray compaction)."""
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4", "sampler.samples_per_ray=24",
        "sampler.near=0.05", "grid.resolution=16",
        "sampler.tighten_res=8", "sampler.occupancy_mask_res=8",
        "render.ray_compact=true", "render.ray_compact_fraction=1.0",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    n = 64
    rng = np.random.default_rng(0)
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = (-o / np.linalg.norm(o, axis=-1, keepdims=True)).astype(np.float32)
    rays = Rays(
        origins=jnp.asarray(o), directions=jnp.asarray(d),
        viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)),
    )
    occ = jnp.ones((16, 16, 16), bool)
    outs = {}
    for placement in ("uniform", "occupancy_cdf"):
        c = cfg.apply_overrides([f"sampler.placement={placement}"])
        r = make_grid_renderer(
            field, c.grid, c.sampler, c.render, strategy="march",
            compact=False,
        )
        outs[placement] = np.asarray(r(params, rays, None, occ).rgb)
    np.testing.assert_allclose(
        outs["uniform"], outs["occupancy_cdf"], atol=2e-4
    )


def test_pipeline_cdf_placement_validation():
    """occupancy_cdf is a grid_march AND (since round 4) fused
    quadrature; interval/uniform pipelines reject it.  density_cdf
    stays march-only (the fused fold probes binary occupancy bins)."""
    from tnerf.config import Config
    from tnerf.train_loop import build_field, build_renderer

    for pipe in ("grid_intervals", "uniform"):
        cfg = Config().apply_overrides([
            f"render.pipeline={pipe}", "sampler.placement=occupancy_cdf",
        ])
        field = build_field(cfg)
        with pytest.raises(ValueError, match="placement"):
            build_renderer(cfg, field)
    cfg = Config().apply_overrides([
        "render.pipeline=fused", "sampler.placement=density_cdf",
    ])
    with pytest.raises(ValueError, match="density_cdf"):
        build_renderer(cfg, build_field(cfg))
    # fused + occupancy_cdf builds (the round-4 tmode kernel)
    cfg = Config().apply_overrides([
        "render.pipeline=fused", "sampler.placement=occupancy_cdf",
    ])
    build_renderer(cfg, build_field(cfg))


def test_renderer_cdf_placement_trains_with_jitter():
    """The jittered (training) path through cdf_place: sparse grid,
    key-driven render stays finite and near the midpoint render."""
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4", "sampler.samples_per_ray=16",
        "sampler.near=0.05", "grid.resolution=16",
        "sampler.tighten_res=8", "sampler.occupancy_mask_res=16",
        "sampler.placement=occupancy_cdf", "sampler.cdf_bins=32",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    occ = np.zeros((16, 16, 16), bool)
    occ[:, :, 8:10] = True
    n = 32
    rng = np.random.default_rng(2)
    o = np.stack([rng.uniform(-.5, .5, n), rng.uniform(-.5, .5, n),
                  np.full(n, -3.0)], -1).astype(np.float32)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
    rays = Rays(origins=jnp.asarray(o), directions=jnp.asarray(d),
                viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)))
    r = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                           strategy="march", compact=False)
    out_j = np.asarray(r(params, rays, jax.random.PRNGKey(7), jnp.asarray(occ)).rgb)
    out_m = np.asarray(r(params, rays, None, jnp.asarray(occ)).rgb)
    assert np.all(np.isfinite(out_j))
    assert np.abs(out_j - out_m).mean() < 0.05


def test_cdf_occupied_sample_fraction_closed_form():
    """Slab grid: each hitting ray's fraction must equal the occupied-bin
    mass K(1+f)/(K(1+f)+(P-K)f) with K measured from the same probes."""
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.config import Config
    from tnerf.render.grid_renderer import cdf_occupied_sample_fraction

    cfg = Config().apply_overrides([
        "sampler.near=0.05", "grid.resolution=16",
        "sampler.tighten=false", "sampler.occupancy_mask_res=16",
        "sampler.cdf_bins=32", "sampler.cdf_floor=0.01",
    ])
    occ = np.zeros((16, 16, 16), bool)
    occ[:, :, 8:10] = True  # z-slab: 1/8 of the box
    n = 16
    o = np.stack([np.linspace(-0.5, 0.5, n), np.zeros(n), np.full(n, -3.0)],
                 -1).astype(np.float32)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
    rays = Rays(origins=jnp.asarray(o), directions=jnp.asarray(d),
                viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)))
    got = float(cdf_occupied_sample_fraction(
        rays, jnp.asarray(occ), cfg.grid, cfg.sampler
    ))
    # full span [0.05?, box]: rays enter at z=-1 exit z=+1, slab is
    # 2/16 of that span -> K = 32 * (2/16) = 4 occupied bins
    K, P, f = 4, 32, 0.01
    expect = K * (1 + f) / (K * (1 + f) + (P - K) * f)
    np.testing.assert_allclose(got, expect, rtol=0.15)
    # and it is far above the cell-occupancy proxy (1/8)
    assert got > 0.8


def test_cdf_compacted_shade_matches_dense():
    """Sample compaction must be exact under CDF quadrature too: the
    compacted hashgrid render (nonuniform deltas, support mask) equals
    the dense-masked render on a sparse grid."""
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        "field_.encoding=hashgrid", "field_.hash_levels=4",
        "field_.hash_log2_table_size=10", "field_.hash_max_resolution=64",
        "field_.hash_gather_mode=gather", "field_.compute_dtype=float32",
        "sampler.samples_per_ray=16", "sampler.near=0.05",
        "grid.resolution=16", "sampler.tighten_res=8",
        "sampler.occupancy_mask_res=16",
        "sampler.placement=occupancy_cdf", "sampler.cdf_bins=32",
    ])
    field = NeRFField(cfg.field_, cfg.grid, arch="twobranch")
    params = field.init(jax.random.PRNGKey(0))
    occ = np.zeros((16, 16, 16), bool)
    occ[:, :, 8:10] = True
    n = 48
    rng = np.random.default_rng(4)
    o = np.stack([rng.uniform(-.5, .5, n), rng.uniform(-.5, .5, n),
                  np.full(n, -3.0)], -1).astype(np.float32)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
    rays = Rays(origins=jnp.asarray(o), directions=jnp.asarray(d),
                viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)))
    outs = {}
    for compact in (False, True):
        r = make_grid_renderer(
            field, cfg.grid, cfg.sampler, cfg.render, strategy="march",
            compact=compact, compact_fraction=1.0,
        )
        outs[compact] = r(params, rays, None, jnp.asarray(occ))
    np.testing.assert_allclose(
        np.asarray(outs[False].rgb), np.asarray(outs[True].rgb), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(outs[False].acc), np.asarray(outs[True].acc), atol=2e-5
    )
