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
