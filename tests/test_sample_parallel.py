"""Sample-parallel (SP) rendering on the virtual 8-device mesh: the
segmented compositor sharded over ("data", "sample") must match the
single-device grid_intervals renderer in outputs AND gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tnerf.cameras import Rays, viewdirs_to_thetaphi
from tnerf.config import Config
from tnerf.fields.nerf_field import NeRFField
from tnerf.parallel.sample_parallel import make_sp_interval_renderer
from tnerf.render.grid_renderer import make_grid_renderer


@pytest.fixture(scope="module")
def setup():
    cfg = Config().apply_overrides([
        "sampler.samples_per_interval=8", "grid.resolution=8",
        "grid.max_hits=24",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4", "field_.compute_dtype=float32",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 64
    o = rng.uniform(-1, 1, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3
    d = -o + rng.uniform(-0.3, 0.3, (B, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        viewdirs_to_thetaphi(jnp.asarray(d, jnp.float32)),
    )
    occ = jnp.asarray(rng.uniform(0, 1, (8, 8, 8)) < 0.3)
    ref_r = make_grid_renderer(
        field, cfg.grid, cfg.sampler, cfg.render,
        strategy="intervals", compact=False,
    )
    return cfg, field, params, rays, occ, ref_r


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (8, 1)])
def test_sp_render_parity(setup, mesh_shape):
    cfg, field, params, rays, occ, ref_r = setup
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(mesh_shape), ("data", "sample")
    )
    sp_r = make_sp_interval_renderer(
        field, cfg.grid, cfg.sampler, cfg.render, mesh
    )
    ref = ref_r(params, rays, None, occ)
    got = jax.jit(lambda p, r, oc: sp_r(p, r, None, oc))(params, rays, occ)
    np.testing.assert_allclose(
        np.asarray(ref.rgb), np.asarray(got.rgb), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.acc), np.asarray(got.acc), atol=5e-5
    )
    # Per-sample arrays reassemble exactly across the sample shards.
    np.testing.assert_allclose(
        np.asarray(ref.weights), np.asarray(got.weights), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.transmittance), np.asarray(got.transmittance),
        atol=5e-5,
    )


def test_sp_gradient_parity(setup):
    cfg, field, params, rays, occ, ref_r = setup
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("data", "sample")
    )
    sp_r = make_sp_interval_renderer(
        field, cfg.grid, cfg.sampler, cfg.render, mesh
    )

    def loss_ref(p):
        return (ref_r(p, rays, None, occ).rgb ** 2).sum()

    def loss_sp(p):
        return (sp_r(p, rays, None, occ).rgb ** 2).sum()

    g_ref = jax.grad(loss_ref)(params)
    g_sp = jax.jit(jax.grad(loss_sp))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12))
        assert rel < 1e-5, rel


def test_sp_indivisible_sample_axis_raises(setup):
    cfg, field, params, rays, occ, ref_r = setup
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(1, 8), ("data", "sample")
    )
    bad = cfg.apply_overrides(
        ["sampler.samples_per_interval=5", "grid.max_hits=5"]
    )
    with pytest.raises(ValueError, match="divide"):
        make_sp_interval_renderer(
            field, bad.grid, bad.sampler, bad.render, mesh
        )
