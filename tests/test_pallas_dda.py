"""Pallas DDA traversal kernel parity (interpret mode, SURVEY §4 kernel
strategy): must emit exactly the interval set of the oracle-tested scan
walk, dense and with coarse-skip occupancy."""

import numpy as np
import pytest

import jax.numpy as jnp

from tnerf.config import GridConfig
from tnerf.grid.pallas_dda import pack_coarse_words, traverse_grid_pallas
from tnerf.grid.traversal import make_coarse_occupancy, traverse_grid


def _rays(B, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    t = rng.uniform(-1.2, 1.2, (B, 3))
    d = t - o
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o.astype(np.float32)), jnp.asarray(d)


def _assert_interval_parity(ref, got, B, atol=3e-4):
    for b in range(B):
        rm = np.asarray(ref.mask[b])
        gm = np.asarray(got.mask[b])
        rc = np.asarray(ref.cells[b])[rm]
        gc = np.asarray(got.cells[b])[gm]
        np.testing.assert_array_equal(rc, gc)
        np.testing.assert_allclose(
            np.asarray(ref.t_starts[b])[rm], np.asarray(got.t_starts[b])[gm],
            atol=atol,
        )
        np.testing.assert_allclose(
            np.asarray(ref.t_ends[b])[rm], np.asarray(got.t_ends[b])[gm],
            atol=atol,
        )


def test_dense_parity_with_scan_walk():
    B = 300  # pads to 1024 internally: padding path covered
    o, d = _rays(B)
    grid = GridConfig(resolution=16)
    ref = traverse_grid(o, d, grid, max_hits=48)
    got = traverse_grid_pallas(o, d, grid, max_hits=48, interpret=True)
    _assert_interval_parity(ref, got, B)


@pytest.mark.parametrize("res,factor", [(16, 4), (32, 8)])
def test_occupancy_parity_with_scan_walk(res, factor):
    B = 300
    o, d = _rays(B, seed=1)
    grid = GridConfig(resolution=res)
    rng = np.random.default_rng(2)
    occ = jnp.asarray(rng.uniform(0, 1, (res, res, res)) < 0.08)
    ref = traverse_grid(o, d, grid, occupancy=occ, max_hits=3 * res)
    got = traverse_grid_pallas(
        o, d, grid, occ, coarse_factor=factor, max_hits=3 * res, interpret=True
    )
    _assert_interval_parity(ref, got, B)


def test_pack_coarse_words_bits():
    rng = np.random.default_rng(3)
    occ = rng.uniform(0, 1, (16, 16, 16)) < 0.3
    words = np.asarray(pack_coarse_words(jnp.asarray(occ)))
    assert words.shape == (8, 128)
    flat = occ.reshape(-1)
    for c in rng.integers(0, 4096, 64):
        assert ((words[0, c >> 5] >> (c & 31)) & 1) == int(flat[c])


def test_capacity_truncation_and_padding():
    o, d = _rays(64, seed=4)
    grid = GridConfig(resolution=16)
    # H > steps: padded with invalid slots
    got = traverse_grid_pallas(o, d, grid, max_hits=64, steps=48, interpret=True)
    assert got.cells.shape[-1] == 64
    assert not np.asarray(got.mask[:, 48:]).any()
    # H < steps: truncated
    got2 = traverse_grid_pallas(o, d, grid, max_hits=10, steps=48, interpret=True)
    assert got2.cells.shape[-1] == 10
