"""Pallas compositor: forward parity with the jnp compositor, and the
analytic custom VJP vs jax.grad of the jnp reference (SURVEY §4:
'custom_vjp vs jax.grad of a reference jnp compositor')."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from tnerf.render.composite import composite
from tnerf.render.pallas_composite import pallas_composite


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, S = 200, 128  # B deliberately not a multiple of the ray tile
    sigma = jnp.asarray(rng.uniform(0, 4, (B, S)), jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.01, 0.1, (B, S)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, S)) < 0.7, jnp.float32)
    t = jnp.cumsum(deltas, axis=1)
    rgb = jnp.asarray(rng.uniform(0, 1, (B, S, 3)), jnp.float32)
    return sigma, deltas, mask, t, rgb


def _ref(sigma, deltas, mask, t, rgb):
    res = composite(rgb, sigma, deltas, t_mid=t, mask=mask.astype(bool))
    T_final = jnp.exp(-jnp.sum(sigma * deltas * mask, axis=1))
    return res, T_final


def test_forward_matches_jnp(data):
    sigma, deltas, mask, t, rgb = data
    out = np.asarray(pallas_composite(sigma, deltas, mask, t, rgb, True))
    res, T_final = _ref(sigma, deltas, mask, t, rgb)
    np.testing.assert_allclose(out[:, 0:3], np.asarray(res.rgb), atol=1e-5)
    np.testing.assert_allclose(out[:, 3], np.asarray(res.acc), atol=1e-5)
    np.testing.assert_allclose(out[:, 4], np.asarray(res.depth), atol=1e-4)
    np.testing.assert_allclose(out[:, 5], np.asarray(T_final), atol=1e-5)


def test_custom_vjp_matches_autodiff(data):
    sigma, deltas, mask, t, rgb = data
    gt = jax.random.uniform(jax.random.PRNGKey(1), (sigma.shape[0], 3))

    def loss_pallas(sigma, deltas, t, rgb):
        out = pallas_composite(sigma, deltas, mask, t, rgb, True)
        return jnp.mean((out[:, 0:3] - gt) ** 2) + 0.1 * jnp.mean(out[:, 4])

    def loss_ref(sigma, deltas, t, rgb):
        res = composite(rgb, sigma, deltas, t_mid=t, mask=mask.astype(bool))
        return jnp.mean((res.rgb - gt) ** 2) + 0.1 * jnp.mean(res.depth)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(sigma, deltas, t, rgb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(sigma, deltas, t, rgb)
    names = ["dsigma", "ddeltas", "dt", "drgb"]
    for n, a, b in zip(names, gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, err_msg=n
        )


def test_t_final_gradient_path(data):
    """The T_final output's gradient flows through the suffix term."""
    sigma, deltas, mask, t, rgb = data

    def loss(sigma):
        out = pallas_composite(sigma, deltas, mask, t, rgb, True)
        return jnp.sum(out[:, 5])

    g = jax.grad(loss)(sigma)
    # dT_final/dsigma_s = -delta_s * mask_s * T_final < 0 where mask on
    gn = np.asarray(g)
    T_final = np.exp(-np.sum(np.asarray(sigma * deltas * mask), axis=1))
    expect = -np.asarray(deltas) * np.asarray(mask) * T_final[:, None]
    np.testing.assert_allclose(gn, expect, atol=1e-6)


def test_renderer_with_pallas_compositor_matches_and_trains():
    """render.pallas_compositor=true must match the jnp compositor and
    produce identical gradients through a training-style loss."""
    import jax

    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.grid.occupancy import init_occupancy
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
        "sampler.samples_per_ray=128", "grid.resolution=8",
    ])
    cfg_p = cfg.apply_overrides(["render.pallas_compositor=true"])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    oo = rng.uniform(-1, 1, (32, 3))
    oo = oo / np.linalg.norm(oo, axis=-1, keepdims=True) * 2.5
    dd = -oo / np.linalg.norm(oo, axis=-1, keepdims=True)
    rays = Rays(jnp.asarray(oo, jnp.float32), jnp.asarray(dd, jnp.float32),
                viewdirs_to_thetaphi(jnp.asarray(dd, jnp.float32)))
    occ = init_occupancy(cfg.grid).bitfield
    r_jnp = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                               strategy="march", compact=False)
    r_pal = make_grid_renderer(field, cfg_p.grid, cfg_p.sampler, cfg_p.render,
                               strategy="march", compact=False)
    out_j = r_jnp(params, rays, None, occ)
    out_p = r_pal(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(out_p.rgb), np.asarray(out_j.rgb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.acc), np.asarray(out_j.acc), atol=1e-5)

    gt = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    def loss(p, rend):
        return jnp.mean((rend(p, rays, None, occ).rgb - gt) ** 2)

    g_j = jax.grad(lambda p: loss(p, r_jnp))(params)
    g_p = jax.grad(lambda p: loss(p, r_pal))(params)
    for a, b in zip(jax.tree.leaves(g_j), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
