"""Compositing vs NeRF-quadrature closed forms (SURVEY §4: single-sample,
opaque-wall, empty-space cases) and gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from tnerf.render.composite import composite, render_weights


def test_empty_space_gives_background():
    rgb = jnp.ones((4, 8, 3)) * 0.5
    sigma = jnp.zeros((4, 8))
    deltas = jnp.full((4, 8), 0.1)
    res = composite(rgb, sigma, deltas, white_background=True)
    np.testing.assert_allclose(np.asarray(res.rgb), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.acc), 0.0, atol=1e-6)


def test_single_sample_closed_form():
    # one sample: w = 1 - exp(-sigma*delta)
    sigma, delta = 3.0, 0.25
    rgb = jnp.asarray([[[0.2, 0.4, 0.8]]])
    res = composite(rgb, jnp.asarray([[sigma]]), jnp.asarray([[delta]]))
    w = 1.0 - np.exp(-sigma * delta)
    np.testing.assert_allclose(np.asarray(res.rgb)[0], w * np.array([0.2, 0.4, 0.8]), rtol=1e-6)


def test_opaque_wall_saturates_first_sample():
    S = 16
    sigma = jnp.full((1, S), 1e6)
    deltas = jnp.full((1, S), 0.1)
    rgb = jnp.zeros((1, S, 3)).at[0, 0].set(jnp.asarray([1.0, 0.0, 0.0]))
    res = composite(rgb, sigma, deltas)
    np.testing.assert_allclose(np.asarray(res.rgb)[0], [1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.acc)[0], 1.0, atol=1e-6)


def test_transmittance_is_exclusive():
    # T_0 must be exactly 1 regardless of sigma_0 (defect D3 regression)
    sigma = jnp.asarray([[10.0, 1.0, 1.0]])
    deltas = jnp.ones((1, 3))
    _, T = render_weights(sigma, deltas)
    assert float(T[0, 0]) == 1.0
    np.testing.assert_allclose(float(T[0, 1]), np.exp(-10.0), rtol=1e-5)


def test_weights_sum_to_one_minus_final_transmittance():
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.uniform(0, 5, (8, 32)), jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.01, 0.2, (8, 32)), jnp.float32)
    w, T = render_weights(sigma, deltas)
    total_tau = np.sum(np.asarray(sigma) * np.asarray(deltas), axis=-1)
    np.testing.assert_allclose(
        np.asarray(w).sum(-1), 1.0 - np.exp(-total_tau), rtol=1e-4
    )


def test_mask_excludes_samples():
    sigma = jnp.full((1, 4), 2.0)
    deltas = jnp.full((1, 4), 0.5)
    mask = jnp.asarray([[True, False, True, False]])
    w, _ = render_weights(sigma, deltas, mask)
    assert float(w[0, 1]) == 0.0 and float(w[0, 3]) == 0.0
    # masked run == unmasked run on the kept samples only
    w2, _ = render_weights(jnp.full((1, 2), 2.0), jnp.full((1, 2), 0.5))
    np.testing.assert_allclose(np.asarray(w)[0, [0, 2]], np.asarray(w2)[0], rtol=1e-6)


def test_gradients_flow_and_match_numerical():
    rng = np.random.default_rng(2)
    sigma0 = jnp.asarray(rng.uniform(0.1, 2.0, (2, 6)), jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.05, 0.2, (2, 6)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (2, 6, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (2, 3)), jnp.float32)

    def loss(sig):
        res = composite(rgb, sig, deltas, white_background=True)
        return jnp.mean((res.rgb - gt) ** 2)

    g = jax.grad(loss)(sigma0)
    assert np.all(np.isfinite(np.asarray(g)))
    # numerical check on one coordinate
    eps = 1e-3
    e = jnp.zeros_like(sigma0).at[0, 2].set(eps)
    num = (loss(sigma0 + e) - loss(sigma0 - e)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 2]), float(num), rtol=5e-2, atol=1e-5)
