"""Fused render kernel vs the production field+compositor (SURVEY §4
kernel-parity: every Pallas kernel gets an interpret=True CPU path and an
equivalent pure-jnp reference)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from tnerf.config import Config
from tnerf.fields.nerf_field import NeRFField
from tnerf.grid.traversal import ray_aabb
from tnerf.render.pallas_fused import (
    fused_reference,
    make_fused_renderer,
    pack_rays,
)


@pytest.fixture(scope="module")
def setup():
    cfg = Config().apply_overrides([
        "field_.hidden_width=64", "field_.hidden_layers=3",
        "sampler.near=0.05",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    # scale params up so densities are nontrivial
    params = jax.tree.map(lambda x: x * 1.5, params)

    B, S = 256, 64
    rng = np.random.default_rng(0)
    o = rng.uniform(-1, 1, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d += rng.normal(scale=0.15, size=(B, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    from tnerf.cameras import viewdirs_to_thetaphi

    tp = viewdirs_to_thetaphi(d)
    te, tx = ray_aabb(o, d, cfg.grid.aabb_min, cfg.grid.aabb_max)
    te = jnp.maximum(te, 0.05)
    tx = jnp.maximum(tx, te)
    dt = (tx - te) / S
    rays_packed = pack_rays(o, d, tp, te, dt)
    mask = (tx > te)[:, None] & jnp.ones((B, S), bool)
    return cfg, field, params, rays_packed, mask.astype(jnp.float32), (B, S)


def test_fused_kernel_matches_reference(setup):
    cfg, field, params, rays_packed, mask_t, (B, S) = setup
    fused = make_fused_renderer(cfg.field_, cfg.grid, b_tile=128, sc=32,
                                interpret=True)
    got = np.asarray(fused(params, rays_packed, mask_t))
    want = np.asarray(fused_reference(params, rays_packed, mask_t,
                                      cfg.field_, cfg.grid))
    # bf16 matmuls + f32 composite: col 0-2 rgb, 3 acc, 4 depth, 5 T
    np.testing.assert_allclose(got[:, 0:4], want[:, 0:4], atol=2e-3)
    np.testing.assert_allclose(got[:, 4], want[:, 4], atol=6e-3)  # depth
    np.testing.assert_allclose(got[:, 5], want[:, 5], atol=2e-3)
    # the scene must be non-trivial for this test to mean anything
    assert float(want[:, 3].max()) > 0.3, "test scene rendered ~empty"


def test_fused_kernel_respects_mask(setup):
    cfg, field, params, rays_packed, mask_t, (B, S) = setup
    fused = make_fused_renderer(cfg.field_, cfg.grid, b_tile=128, sc=32,
                                interpret=True)
    rng = np.random.default_rng(1)
    mask2 = mask_t * jnp.asarray(rng.uniform(size=mask_t.shape) < 0.5,
                                 jnp.float32)
    got = np.asarray(fused(params, rays_packed, mask2))
    want = np.asarray(fused_reference(params, rays_packed, mask2,
                                      cfg.field_, cfg.grid))
    np.testing.assert_allclose(got[:, 0:4], want[:, 0:4], atol=2e-3)


def test_fused_kernel_zero_mask_gives_empty(setup):
    cfg, field, params, rays_packed, mask_t, (B, S) = setup
    fused = make_fused_renderer(cfg.field_, cfg.grid, b_tile=128, sc=32,
                                interpret=True)
    got = np.asarray(fused(params, rays_packed, jnp.zeros_like(mask_t)))
    np.testing.assert_allclose(got[:, 0:5], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[:, 5], 1.0, atol=1e-6)  # full transmittance


def test_early_termination_consistent(setup):
    """Cranked-up density saturates rays in the first chunk; remaining
    chunks are skipped.  Compare the kernel against ITSELF with
    termination disabled (term_eps=0): identical precision path, so any
    difference is exactly the skipped tail — bounded by term_eps.
    (vs the jnp reference, hot params amplify bf16 rounding at the
    absorption front, which would mask termination bugs.)"""
    cfg, field, params, _, _, (B, S) = setup
    # make the field opaque EVERYWHERE: shift the sigma-head bias so
    # softplus(raw - 1) ~ 19 at every point
    bs = list(params["trunk"]["b"])
    bs[-1] = bs[-1].at[3].add(20.0)
    params_hot = {"trunk": {"w": params["trunk"]["w"], "b": bs}}
    # dedicated rays aimed straight at the center so EVERY ray of every
    # block saturates (block-level skip requires all 128 rays terminated)
    rng = np.random.default_rng(3)
    o = rng.uniform(-1, 1, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    from tnerf.cameras import viewdirs_to_thetaphi

    te, tx = ray_aabb(o, d, cfg.grid.aabb_min, cfg.grid.aabb_max)
    te = jnp.maximum(te, 0.05)
    rays_packed = pack_rays(o, d, viewdirs_to_thetaphi(d), te, (tx - te) / S)
    mask_t = jnp.ones((B, S), jnp.float32)
    fused = make_fused_renderer(cfg.field_, cfg.grid, b_tile=128, sc=32,
                                term_eps=1e-4, interpret=True)
    fused_exact = make_fused_renderer(cfg.field_, cfg.grid, b_tile=128,
                                      sc=32, term_eps=0.0, interpret=True)
    got = np.asarray(fused(params_hot, rays_packed, mask_t))
    want = np.asarray(fused_exact(params_hot, rays_packed, mask_t))
    np.testing.assert_allclose(got[:, 0:5], want[:, 0:5], atol=2e-4)
    # and the termination path must actually have triggered
    assert float(want[:, 5].max()) < 1e-4, "scene not opaque enough to test"
    # sanity vs the production reference at loose tolerance (precision)
    ref = np.asarray(fused_reference(params_hot, rays_packed, mask_t,
                                     cfg.field_, cfg.grid))
    np.testing.assert_allclose(got[:, 0:4], ref[:, 0:4], atol=0.15)


def test_fused_pipeline_renderer_protocol(setup):
    """The fused pipeline adapter: standard renderer protocol, padding,
    occupancy masking, white background."""
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.grid.occupancy import init_occupancy
    from tnerf.render.grid_renderer import make_grid_renderer
    from tnerf.render.pallas_fused import make_fused_pipeline_renderer

    cfg, field, params, _, _, _ = setup
    cfg = cfg.apply_overrides([
        "sampler.samples_per_ray=64", "render.white_background=true",
    ])
    fusedr = make_fused_pipeline_renderer(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True
    )
    marchr = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                                strategy="march", compact=False)
    rng = np.random.default_rng(9)
    B = 200  # deliberately NOT a multiple of b_tile (tests padding)
    o = rng.uniform(-1, 1, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = Rays(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                viewdirs_to_thetaphi(jnp.asarray(d, jnp.float32)))
    occ = init_occupancy(cfg.grid).bitfield
    got = fusedr(params, rays, None, occ)
    want = marchr(params, rays, None, occ)
    assert got.rgb.shape == (B, 3)
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb),
                               atol=3e-3)
    np.testing.assert_allclose(np.asarray(got.acc), np.asarray(want.acc),
                               atol=3e-3)
