"""Occupancy grid update semantics: decay-max EMA, thresholding,
warmup-dense start (the capability BASELINE config 5 requires on top of
the reference's static dense grid)."""

import numpy as np

import jax
import jax.numpy as jnp

from tnerf.config import GridConfig
from tnerf.grid.occupancy import (
    cell_centers,
    init_occupancy,
    occupancy_fraction,
    update_occupancy,
)


def test_initial_state_dense_like_reference():
    grid = GridConfig(resolution=8)
    st = init_occupancy(grid)
    assert bool(st.bitfield.all())  # all 512 cells occupied (main.cu:394-399)
    assert float(occupancy_fraction(st)) == 1.0
    assert float(st.density_ema.max()) == 0.0  # first update reflects the field


def test_update_prunes_empty_space():
    grid = GridConfig(resolution=8, density_threshold=0.01)
    st = init_occupancy(grid)

    # density: a ball of radius 0.5 at the origin
    def density(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.5, 10.0, 0.0)

    st = update_occupancy(st, density, grid, jax.random.PRNGKey(0))
    frac = float(occupancy_fraction(st))
    # ball volume / box volume = (4/3 pi 0.125) / 8 ~ 0.065; jittered
    # probes blur the boundary
    assert 0.02 < frac < 0.2
    # the center cell is occupied, the corners are not
    bits = np.asarray(st.bitfield)
    assert bits[4, 4, 4]
    assert not bits[0, 0, 0]


def test_ema_decays_stale_density():
    grid = GridConfig(resolution=4, density_threshold=0.01, ema_decay=0.5)
    st = init_occupancy(grid)
    hot = lambda x: jnp.full(x.shape[:-1], 5.0)
    cold = lambda x: jnp.zeros(x.shape[:-1])
    st = update_occupancy(st, hot, grid, jax.random.PRNGKey(0))
    assert bool(st.bitfield.all())
    # density vanishes; decay-max halves the EMA each update
    for i in range(12):
        st = update_occupancy(st, cold, grid, jax.random.PRNGKey(i + 1))
    assert not bool(st.bitfield.any())
    assert int(st.step) == 13


def test_cell_centers_geometry():
    grid = GridConfig(resolution=2, aabb_min=(-1, -1, -1), aabb_max=(1, 1, 1))
    c = np.asarray(cell_centers(grid))
    assert c.shape == (2, 2, 2, 3)
    np.testing.assert_allclose(c[0, 0, 0], [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(c[1, 1, 1], [0.5, 0.5, 0.5])
