"""Sharded occupancy-grid refresh.

SURVEY §2.4's "replicated field + sharded occupancy grid update": the
refresh probes one jittered point per cell — res^3 field evaluations
that the single-device `update_occupancy` replicates on EVERY chip of a
mesh (the reference has no grid updates at all; this is the north-star
capability's multi-chip form).  The probe compute is embarrassingly
parallel over cells: each chip evaluates its slice of the flattened
probe array and a tiled all_gather over the mesh axes reassembles the
full sigma grid; the EMA/threshold update is elementwise and stays
replicated (res^3 bools — not worth sharding).

Bit-identical to the single-device update by construction: the jitter
key is replicated so every chip draws the SAME probe set, each position
is evaluated by exactly one chip, and the EMA arithmetic is unchanged.
Requires replicated params (pure DP or DPxSP meshes); table-parallel
runs keep the replicated update — their density eval needs the
cross-shard encode that lives inside the TP renderer's own shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tnerf.config import GridConfig
from tnerf.grid.occupancy import (
    OccupancyGridState,
    cell_centers,
    ema_threshold_update,
)


def make_sharded_occupancy_update(
    density_fn,
    grid: GridConfig,
    mesh: Mesh,
    mask=None,
):
    """Build update(state, params, key) -> OccupancyGridState with the
    cell probes sharded over EVERY axis of `mesh`.

    density_fn: (params, positions [..., 3]) -> sigma [...].
    mask: optional static bound (grid.mesh_path) — same clamping as
    update_occupancy(mask=...).
    """
    res = grid.resolution
    n = res ** 3
    k = int(np.prod(list(mesh.shape.values())))
    pad = (-n) % k
    axis_names = tuple(mesh.axis_names)
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    h = (hi - lo) / res

    def probe_local(params, pts_shard):
        sig = density_fn(params, pts_shard)
        # Innermost mesh axis first: each tiled all_gather concatenates
        # blocks along that axis's device index, so gathering in reverse
        # axis order reassembles the row-major block layout P(axis_names)
        # sharded the flat cell array with.
        for ax in reversed(axis_names):
            sig = jax.lax.all_gather(sig, ax, tiled=True)
        return sig

    sharded_probe = shard_map(
        probe_local,
        mesh=mesh,
        in_specs=(P(), P(axis_names)),
        out_specs=P(),
        # the all_gather chain makes the output replicated, but the
        # static checker cannot infer that through the field closure
        check_vma=False,
    )

    def update(
        state: OccupancyGridState, params, key: jax.Array
    ) -> OccupancyGridState:
        centers = cell_centers(grid)
        jitter = (
            jax.random.uniform(key, centers.shape, jnp.float32, -0.5, 0.5) * h
        )
        pts = (centers + jitter).reshape(-1, 3)
        if pad:
            pts = jnp.pad(pts, ((0, pad), (0, 0)))
        sigma = sharded_probe(params, pts)[:n].reshape(res, res, res)
        ema, bits = ema_threshold_update(state.density_ema, sigma, grid, mask)
        return OccupancyGridState(
            density_ema=ema, bitfield=bits, step=state.step + 1
        )

    # Occupancy state stays replicated on the mesh (same pin as the
    # replicated update in train_loop).
    repl = NamedSharding(mesh, P())
    return jax.jit(update, out_shardings=repl)
