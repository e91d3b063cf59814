"""Ray-grid traversal: per-ray (t_start, t_end, cell) interval lists.

Replaces the reference's RT-core hot path — the per-pixel
`while(hit) optixTrace(...)` loop with slab-test intersection and
closest-hit interval recording (optixPrograms.cu:43-248).

TPU-first design: instead of walking cells sequentially (Amanatides-Woo /
OptiX BVH re-trace — pointer-chasing the VPU hates), observe that a ray's
cell boundaries are exactly the sorted union of its axis-plane crossings:

    t_k^(a) = (lo_a + k*h_a - o_a) / d_a,   a in {x,y,z}, k in 0..res

Sorting those 3*(res+1) values (clipped to the ray's [t_enter, t_exit]
slab range) yields every traversal interval in order, with NO sequential
dependence: one broadcasted compute + one `jnp.sort` per ray, perfectly
lane-parallel across rays.  Cell ids come from interval midpoints.  This
produces the same interval set as the reference's iterative re-trace,
without its re-entry epsilon fragility, and is the oracle-tested parity
path.  (The reference's slab test, optixPrograms.cu:143-156, is the test
oracle — see tests/test_traversal.py.)

Static shapes throughout: capacity MAX_HITS = 3*res per ray (the
reference's own bound, main.cu:486), valid intervals compacted to the
front, invalid slots masked — the SoA layout of SURVEY §7.1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from tnerf.config import GridConfig


class Intervals(NamedTuple):
    """Per-ray traversal intervals (static SoA; replaces reference
    RayPayload, main.cu:308-317)."""

    t_starts: jnp.ndarray  # [..., MAX_HITS] f32
    t_ends: jnp.ndarray    # [..., MAX_HITS] f32
    cells: jnp.ndarray     # [..., MAX_HITS] i32 flat cell id (x*res^2+y*res+z), -1 invalid
    mask: jnp.ndarray      # [..., MAX_HITS] bool
    t_enter: jnp.ndarray   # [...] f32 ray's entry t into the grid AABB
    t_exit: jnp.ndarray    # [...] f32 ray's exit t


def ray_aabb(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    aabb_min,
    aabb_max,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test (the math of reference optixPrograms.cu:143-156, done
    once per ray instead of once per primitive per trace).

    Returns (t_enter, t_exit); the ray intersects iff
    t_exit > max(t_enter, 0).
    """
    lo = jnp.asarray(aabb_min, jnp.float32)
    hi = jnp.asarray(aabb_max, jnp.float32)
    inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)
    t0 = (lo - origins) * inv_d
    t1 = (hi - origins) * inv_d
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return t_enter, t_exit


def traverse_grid(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    grid: GridConfig,
    occupancy: Optional[jnp.ndarray] = None,
    max_hits: Optional[int] = None,
) -> Intervals:
    """Enumerate a ray's grid-cell intervals, occupied-only if an
    occupancy bitfield is given.

    origins, directions: [..., 3] (directions need not be normalized)
    occupancy: optional [res, res, res] bool; None = all occupied (the
        reference's behavior — it has no pruning, every crossed cell is
        reported).
    max_hits: output capacity (default grid.effective_max_hits = 3*res).

    Valid intervals are compacted to the front of the hit axis in ray
    order; intervals beyond capacity are dropped (the reference drops
    them too — its closest-hit writes past-capacity hits out of bounds;
    we drop explicitly).
    """
    res = grid.resolution
    H = max_hits if max_hits is not None else grid.effective_max_hits
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    cell = (hi - lo) / res

    t_enter, t_exit = ray_aabb(origins, directions, lo, hi)
    t_enter = jnp.maximum(t_enter, 0.0)  # rays start at their origin
    hit_box = t_exit > t_enter

    # All axis-plane crossings, clipped into [t_enter, t_exit].
    k = jnp.arange(res + 1, dtype=jnp.float32)  # [res+1]
    planes = lo[..., :, None] + cell[..., :, None] * k  # [3, res+1]
    inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)
    t_cross = (planes - origins[..., :, None]) * inv_d[..., :, None]  # [..., 3, res+1]
    t_cross = t_cross.reshape(*origins.shape[:-1], 3 * (res + 1))
    t_lo = t_enter[..., None]
    t_hi = t_exit[..., None]
    t_cross = jnp.clip(t_cross, t_lo, t_hi)
    # Boundaries: crossings plus the entry point itself; exit is already
    # present (clip maps at least one crossing to t_exit on a box hit).
    bounds = jnp.sort(jnp.concatenate([t_lo, t_cross], axis=-1), axis=-1)

    seg_start = bounds[..., :-1]
    seg_end = bounds[..., 1:]
    seg_len = seg_end - seg_start
    valid = (seg_len > 1e-7) & hit_box[..., None]

    # Cell id from the segment midpoint.
    t_mid = 0.5 * (seg_start + seg_end)
    p_mid = origins[..., None, :] + directions[..., None, :] * t_mid[..., None]
    ijk = jnp.clip(
        jnp.floor((p_mid - lo) / cell).astype(jnp.int32), 0, res - 1
    )  # [..., S, 3]
    flat_cell = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]

    if occupancy is not None:
        occ = occupancy.reshape(-1).astype(bool)
        valid = valid & occ[flat_cell]

    # Stable compaction of valid intervals to the front (replaces the
    # reference's thrust exclusive_scan + host repack, main.cu:631-674).
    S = seg_start.shape[-1]
    order_key = jnp.where(valid, 0, 1) * (S + 1) + jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32), seg_start.shape
    )
    perm = jnp.argsort(order_key, axis=-1)[..., :H]
    take = lambda a: jnp.take_along_axis(a, perm, axis=-1)
    mask = take(valid)
    return Intervals(
        t_starts=take(seg_start),
        t_ends=take(seg_end),
        cells=jnp.where(mask, take(flat_cell), -1),
        mask=mask,
        t_enter=t_enter,
        t_exit=t_exit,
    )


def march_samples_t(
    t_enter: jnp.ndarray,
    t_exit: jnp.ndarray,
    n_samples: int,
    jitter: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-count uniform marching over each ray's [t_enter, t_exit]
    slab span — the fused fast path (intent of the reference's dead
    "ray sample" OptiX pipeline #2, optixPrograms.cu:250-314): sample
    generation inside the traversal, no interval lists.

    jitter: optional [..., n_samples] uniforms in [0,1) for stratified
    placement. Returns (t [..., S], delta [..., S]).
    """
    span = jnp.maximum(t_exit - t_enter, 0.0)
    dt = span / n_samples
    frac = jnp.arange(n_samples, dtype=jnp.float32)
    if jitter is None:
        frac = frac + 0.5
        t = t_enter[..., None] + dt[..., None] * frac
    else:
        t = t_enter[..., None] + dt[..., None] * (frac + jitter)
    deltas = jnp.broadcast_to(dt[..., None], t.shape)
    return t, deltas


def tightened_range(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_enter: jnp.ndarray,
    t_exit: jnp.ndarray,
    occupancy: jnp.ndarray,
    grid: GridConfig,
    probes: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shrink each ray's [t_enter, t_exit] to the span of OCCUPIED cells.

    Probes `probes` points along the slab span against the occupancy
    bitfield and returns the [first, last] occupied t padded by one probe
    step + one cell diagonal (so no occupied cell between probes is
    missed).  Rays hitting nothing collapse to an empty range (t0 == t1),
    which downstream sampling masks out entirely.

    This concentrates the fixed per-ray sample budget on the object
    instead of the whole scene box — the sample-efficiency half of what
    the reference's per-cell interval lists buy, without ragged shapes.
    """
    span = jnp.maximum(t_exit - t_enter, 0.0)
    frac = (jnp.arange(probes, dtype=jnp.float32) + 0.5) / probes
    t = t_enter[..., None] + span[..., None] * frac  # [..., P]
    pts = origins[..., None, :] + directions[..., None, :] * t[..., None]
    occ = occupancy_lookup(pts, occupancy, grid)  # [..., P]
    inf = jnp.float32(jnp.inf)
    t_first = jnp.min(jnp.where(occ, t, inf), axis=-1)
    t_last = jnp.max(jnp.where(occ, t, -inf), axis=-1)
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    cell_diag = jnp.linalg.norm((hi - lo) / grid.resolution)
    pad = span / probes + cell_diag
    hit = t_last >= t_first  # any occupied probe
    t0 = jnp.where(hit, jnp.maximum(t_first - pad, t_enter), t_enter)
    t1 = jnp.where(hit, jnp.minimum(t_last + pad, t_exit), t_enter)
    return t0, t1


def occupancy_lookup(
    positions: jnp.ndarray,
    occupancy: jnp.ndarray,
    grid: GridConfig,
) -> jnp.ndarray:
    """Point-in-occupied-cell test: [..., 3] -> [...] bool."""
    res = grid.resolution
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    ijk = jnp.floor((positions - lo) / ((hi - lo) / res)).astype(jnp.int32)
    inside = jnp.all((ijk >= 0) & (ijk < res), axis=-1)
    ijk = jnp.clip(ijk, 0, res - 1)
    flat = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]
    return inside & occupancy.reshape(-1)[flat]
