"""Grid renderer tests: march & interval strategies must agree with the
dense uniform renderer on a fully-occupied grid (same quadrature, denser
sampling), and compaction must be exact vs non-compacted eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnerf.cameras import Rays, viewdirs_to_thetaphi
from tnerf.config import Config
from tnerf.fields.nerf_field import NeRFField
from tnerf.grid.occupancy import init_occupancy
from tnerf.render.grid_renderer import compacted_field_apply, make_grid_renderer


@pytest.fixture(scope="module")
def setup():
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
        "sampler.samples_per_ray=64", "sampler.samples_per_interval=8",
        "grid.resolution=8",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n = 32
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = Rays(
        origins=jnp.asarray(o),
        directions=jnp.asarray(d),
        viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)),
    )
    return cfg, field, params, rays


def test_march_and_intervals_agree_when_dense(setup):
    """Both strategies integrate the same field over the same geometry;
    with a dense grid and fine sampling they must produce near-identical
    pixels."""
    cfg, field, params, rays = setup
    march = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                               strategy="march", compact=False)
    ivals = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                               strategy="intervals")
    occ = init_occupancy(cfg.grid).bitfield
    r1 = march(params, rays, None, occ)
    r2 = ivals(params, rays, None, occ)
    # 64 uniform samples vs 8/interval x ~12 intervals: both fine enough
    np.testing.assert_allclose(np.asarray(r1.rgb), np.asarray(r2.rgb), atol=0.03)
    np.testing.assert_allclose(np.asarray(r1.acc), np.asarray(r2.acc), atol=0.03)


def test_intervals_dense_matches_none_occupancy(setup):
    cfg, field, params, rays = setup
    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="intervals")
    occ = init_occupancy(cfg.grid).bitfield
    r1 = rend(params, rays, None, occ)
    r2 = rend(params, rays, None, None)  # None = reference dense behavior
    np.testing.assert_allclose(np.asarray(r1.rgb), np.asarray(r2.rgb), atol=1e-5)


def test_compaction_exact_when_capacity_sufficient(setup):
    cfg, field, params, rays = setup
    occ = init_occupancy(cfg.grid).bitfield
    nc = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                            strategy="march", compact=False)
    cp = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                            strategy="march", compact=True,
                            compact_capacity=32 * 64)
    r1 = nc(params, rays, None, occ)
    r2 = cp(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(r1.rgb), np.asarray(r2.rgb), atol=2e-5)


def test_compacted_apply_matches_direct():
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    B, S = 4, 16
    pos = jnp.asarray(rng.uniform(-1, 1, (B, S, 3)), jnp.float32)
    view = jnp.asarray(rng.uniform(0, 3, (B, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, S)) < 0.4)
    rgb_c, sig_c = compacted_field_apply(field, params, pos, view, mask, capacity=B * S)
    rgb_d, sig_d = field.apply(params, pos, view[:, None, :])
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(rgb_c)[m], np.asarray(rgb_d)[m], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sig_c)[m], np.asarray(sig_d)[m], atol=2e-5
    )
    assert np.all(np.asarray(sig_c)[~m] == 0.0)


def test_compaction_overflow_drops_not_corrupts():
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    B, S, cap = 2, 8, 5
    pos = jnp.zeros((B, S, 3))
    view = jnp.zeros((B, 2))
    mask = jnp.ones((B, S), bool)  # 16 wanted, capacity 5
    rgb, sig = compacted_field_apply(field, params, pos, view, mask, capacity=cap)
    s = np.asarray(sig).reshape(-1)
    assert (s[:cap] > 0).all()      # first `cap` samples evaluated
    assert (s[cap:] == 0).all()      # the rest dropped cleanly
