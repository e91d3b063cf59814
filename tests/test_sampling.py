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
