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


def test_tighten_range_pallas_brackets_occupied_span():
    """The Pallas probe-tightening kernel must bracket the occupied span
    (padded) and keep the full span for rays with no occupied probe."""
    from tnerf.config import GridConfig
    from tnerf.grid.pallas_dda import pack_coarse_words, tighten_range_pallas
    from tnerf.grid.traversal import make_coarse_occupancy, ray_aabb

    res, res_c = 64, 16
    grid = GridConfig(resolution=res, aabb_min=(-1.0, -1.0, -1.0),
                      aabb_max=(1.0, 1.0, 1.0))
    occ = np.zeros((res, res, res), bool)
    occ[28:36, 28:36, 28:36] = True  # central blob, x,y,z in [-0.125, 0.125]
    occ_c = make_coarse_occupancy(jnp.asarray(occ), res // res_c)
    words = pack_coarse_words(occ_c)

    # ray through the center hits; a ray offset far in +y misses
    origins = jnp.asarray([[-3.0, 0.0, 0.0], [-3.0, 0.9, 0.0]], jnp.float32)
    directions = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    te, tx = ray_aabb(origins, directions, grid.aabb_min, grid.aabb_max)
    t0, t1 = tighten_range_pallas(
        origins, directions, te, tx, words, res_c, grid, interpret=True
    )
    t0, t1 = np.asarray(t0), np.asarray(t1)
    # hit ray: occupied span is x in [-0.125, 0.125] -> t in [2.875, 3.125];
    # coarse cells are 0.125 wide so the coarse span adds <= 1 cell each side,
    # plus pad (probe step + fine diag). Must bracket, must tighten.
    assert t0[0] < 2.875 and t1[0] > 3.125
    assert t0[0] > float(te[0]) + 0.5 and t1[0] < float(tx[0]) - 0.5
    # miss ray: untouched full span
    np.testing.assert_allclose(t0[1], float(te[1]), rtol=1e-6)
    np.testing.assert_allclose(t1[1], float(tx[1]), rtol=1e-6)


def test_truncated_walk_last_interval_ends_at_cell_exit():
    """When the step budget truncates the walk, the final interval must
    end at that cell's true exit — not stretch to t_exit across space the
    walk never visited (review finding: delta was ~12x the cell width)."""
    from tnerf.config import GridConfig
    from tnerf.grid.pallas_dda import traverse_grid_pallas
    from tnerf.grid.traversal import traverse_grid

    grid = GridConfig(resolution=16, aabb_min=(-1.0, -1.0, -1.0),
                      aabb_max=(1.0, 1.0, 1.0))
    o = jnp.asarray([[-3.0, 0.01, 0.02]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    got = traverse_grid_pallas(o, d, grid, steps=5, max_hits=5, interpret=True)
    want = traverse_grid(o, d, grid, max_hits=5)
    np.testing.assert_allclose(
        np.asarray(got.t_ends[0]), np.asarray(want.t_ends[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.t_starts[0]), np.asarray(want.t_starts[0]), atol=1e-5
    )
