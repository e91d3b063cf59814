"""Ray-grid traversal: per-ray (t_start, t_end, cell) interval lists.

Replaces the reference's RT-core hot path — the per-pixel
`while(hit) optixTrace(...)` loop with slab-test intersection and
closest-hit interval recording (optixPrograms.cu:43-248).

TPU-first design: a ray's cell boundaries are the merge of three SORTED
arithmetic progressions (the per-axis plane crossings)

    t_k^(a) = (lo_a + k*h_a - o_a) / d_a,   a in {x,y,z}

so no general sort is ever needed: a branchless 3-way merge — the
Amanatides-Woo walk expressed as `lax.scan` with a (cell, next-crossing)
carry — emits every interval in order with O(1) vectorized work per step,
lane-parallel across rays.  This produces the same interval set as the
reference's iterative OptiX re-trace, without its re-entry epsilon
fragility, and is the oracle-tested parity path.  (The reference's slab
test, optixPrograms.cu:143-156, is the test oracle — see
tests/test_traversal.py.)  An earlier `jnp.sort`-based formulation was
~1000x slower on TPU (XLA sort lowering): measured 342 ms vs sub-ms per
640K-ray launch at res=8.

Static shapes throughout: capacity MAX_HITS = 3*res per ray (the
reference's own bound, main.cu:486), valid intervals compacted to the
front, invalid slots masked — the SoA layout of SURVEY §7.1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
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

    Implementation: a branchless 3-way MERGE of the per-axis crossing
    progressions — the Amanatides-Woo walk as a `lax.scan` over at most
    3*res steps, fully lane-parallel across rays, carrying (cell index,
    next-crossing t per axis).  Each axis's crossings form an arithmetic
    progression, so the merge needs no sort; intervals are emitted
    already in ray order.  (A first implementation sorted the union of
    crossing t's with `jnp.sort`; XLA's TPU sort lowering made that
    ~1000x slower than this scan — 342 ms vs sub-ms per 640K-ray launch
    at res=8, measured by transport-proof differential timing.)

    Intervals beyond capacity are dropped (the reference drops them too —
    its closest-hit writes past-capacity hits out of bounds; we drop
    explicitly). Invalid slots are masked, not compacted (no extra sort).
    """
    res = grid.resolution
    H = max_hits if max_hits is not None else grid.effective_max_hits
    steps = min(H, 3 * res)
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    cell = (hi - lo) / res

    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)

    t_enter, t_exit = ray_aabb(o, d, lo, hi)
    t_enter = jnp.maximum(t_enter, 0.0)  # rays start at their origin
    hit_box = t_exit > t_enter

    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    inv_d = 1.0 / d_safe
    step_sign = jnp.where(d_safe > 0, 1, -1).astype(jnp.int32)  # [B, 3]
    dt_axis = jnp.abs(cell * inv_d)                              # [B, 3]

    # Entry cell + first crossing t per axis (in the travel direction).
    eps = 1e-6
    p0 = o + d * (t_enter + eps)[..., None]
    ijk0 = jnp.clip(jnp.floor((p0 - lo) / cell).astype(jnp.int32), 0, res - 1)
    next_plane = lo + (ijk0 + (step_sign > 0)).astype(jnp.float32) * cell
    t_next0 = (next_plane - o) * inv_d                           # [B, 3]

    # Carry unpacked into per-axis [B] arrays: [B, 3]-shaped ops pad 3
    # lanes to 128 on TPU (8% utilization), full-width [B] ops don't.
    sx, sy, sz = step_sign[:, 0], step_sign[:, 1], step_sign[:, 2]
    dtx, dty, dtz = dt_axis[:, 0], dt_axis[:, 1], dt_axis[:, 2]

    def body(carry, _):
        t_cur, txn, tyn, tzn, ix, iy, iz = carry
        t_step = jnp.minimum(txn, jnp.minimum(tyn, tzn))
        hx = (txn <= tyn) & (txn <= tzn)           # ties: x > y > z priority
        hy = (~hx) & (tyn <= tzn)
        hz = (~hx) & (~hy)
        t1 = jnp.minimum(t_step, t_exit)
        inb = (
            (ix >= 0) & (ix < res)
            & (iy >= 0) & (iy < res)
            & (iz >= 0) & (iz < res)
        )
        valid = (t1 > t_cur + 1e-7) & hit_box & inb
        flat = (ix * res + iy) * res + iz
        out = (t_cur, t1, jnp.where(valid, flat, -1), valid)
        carry_new = (
            jnp.maximum(t_cur, t_step),
            jnp.where(hx, txn + dtx, txn),
            jnp.where(hy, tyn + dty, tyn),
            jnp.where(hz, tzn + dtz, tzn),
            jnp.where(hx, ix + sx, ix),
            jnp.where(hy, iy + sy, iy),
            jnp.where(hz, iz + sz, iz),
        )
        return carry_new, out

    init = (
        t_enter,
        t_next0[:, 0], t_next0[:, 1], t_next0[:, 2],
        ijk0[:, 0], ijk0[:, 1], ijk0[:, 2],
    )
    _, ys = jax.lax.scan(body, init, None, length=steps)
    t0s, t1s, cells_, valid = ys  # each [steps, B(...)]
    move = lambda a: jnp.moveaxis(a, 0, -1)
    t_starts = move(t0s)
    t_ends = move(t1s)
    cells_ = move(cells_)
    mask = move(valid)

    if occupancy is not None:
        occ = occupancy.reshape(-1).astype(bool)
        mask = mask & occ[jnp.clip(cells_, 0, res ** 3 - 1)] & (cells_ >= 0)
        cells_ = jnp.where(mask, cells_, -1)

    if steps < H:  # pad up to the requested capacity
        pad = H - steps
        padf = lambda a, v: jnp.pad(a, ((0, 0), (0, pad)), constant_values=v)
        t_starts = padf(t_starts, 0.0)
        t_ends = padf(t_ends, 0.0)
        cells_ = padf(cells_, -1)
        mask = padf(mask, False)

    reshape = lambda a: a.reshape(*batch_shape, H)
    return Intervals(
        t_starts=reshape(t_starts),
        t_ends=reshape(t_ends),
        cells=reshape(cells_),
        mask=reshape(mask),
        t_enter=t_enter.reshape(batch_shape),
        t_exit=t_exit.reshape(batch_shape),
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


def make_coarse_occupancy(occupancy: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Max-pool a [res]^3 bitfield by `factor` per axis: a coarse cell is
    occupied iff ANY of its factor^3 fine cells is."""
    res = occupancy.shape[0]
    if res % factor:
        raise ValueError(f"resolution {res} not divisible by factor {factor}")
    c = res // factor
    return occupancy.reshape(c, factor, c, factor, c, factor).any(axis=(1, 3, 5))


def traverse_grid_twolevel(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    grid: GridConfig,
    occupancy: jnp.ndarray,
    coarse_factor: int = 8,
    max_hits: Optional[int] = None,
    steps: Optional[int] = None,
) -> Intervals:
    """Hierarchical DDA: fine Amanatides-Woo walk that JUMPS across
    coarse-empty regions.

    The scale problem with the flat walk: at res=128 a ray crosses up to
    3*128 = 384 cells, and the lock-step scan pays every one of them even
    though real NGP-style grids are ~90% empty.  Here a max-pooled
    (res/coarse_factor)^3 bitfield is consulted each step: inside an
    occupied coarse cell the walk advances one FINE cell (emitting its
    interval); inside an empty coarse cell it advances straight to the
    coarse cell's exit plane in ONE step.  Steps needed per ray drop from
    3*res to (#coarse cells crossed + #fine cells inside occupied coarse
    cells) — typically ~3-6x fewer at ~10% occupancy.  This is the
    RT-core BVH's empty-space-skipping role at scale
    (reference rtx/src/rtxFunctions.cpp:293-351) done TPU-style: a
    branchless lane-parallel scan, occupancy consulted via one [B] gather
    per step.

    Carries only (t, ix, iy, iz); per-axis crossing t's are recomputed
    from the indices each step (cheaper than carrying them: scan-carry
    HBM round-trips dominate at 640K rays).  Emits intervals for fine
    cells whose COARSE cell is occupied; the fine-grained occupancy mask
    is applied to the emitted list exactly like the flat path.
    """
    res = grid.resolution
    cres = res // coarse_factor
    if res % coarse_factor:
        raise ValueError(f"resolution {res} not divisible by coarse factor {coarse_factor}")
    occ_coarse = make_coarse_occupancy(occupancy.reshape(res, res, res), coarse_factor)
    H = max_hits if max_hits is not None else grid.effective_max_hits
    n_steps = steps if steps is not None else min(H, 3 * res)

    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    cell = (hi - lo) / res

    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)

    t_enter, t_exit = ray_aabb(o, d, lo, hi)
    t_enter = jnp.maximum(t_enter, 0.0)
    hit_box = t_exit > t_enter

    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    inv_d = 1.0 / d_safe
    step_sign = jnp.where(d_safe > 0, 1, -1).astype(jnp.int32)
    pos_step = (step_sign > 0).astype(jnp.int32)

    eps = 1e-6
    p0 = o + d * (t_enter + eps)[..., None]
    ijk0 = jnp.clip(jnp.floor((p0 - lo) / cell).astype(jnp.int32), 0, res - 1)

    sx, sy, sz = step_sign[:, 0], step_sign[:, 1], step_sign[:, 2]
    px, py, pz = pos_step[:, 0], pos_step[:, 1], pos_step[:, 2]
    ivx, ivy, ivz = inv_d[:, 0], inv_d[:, 1], inv_d[:, 2]
    dx, dy, dz = d_safe[:, 0], d_safe[:, 1], d_safe[:, 2]
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    hx_, hy_, hz_ = cell[0], cell[1], cell[2]
    lox, loy, loz = lo[0], lo[1], lo[2]
    chx, chy, chz = hx_ * coarse_factor, hy_ * coarse_factor, hz_ * coarse_factor
    occ_c_flat = occ_coarse.reshape(-1)

    def body(carry, _):
        t_cur, ix, iy, iz = carry
        fix, fiy, fiz = ix.astype(jnp.float32), iy.astype(jnp.float32), iz.astype(jnp.float32)
        txn = (lox + (fix + px) * hx_ - ox) * ivx
        tyn = (loy + (fiy + py) * hy_ - oy) * ivy
        tzn = (loz + (fiz + pz) * hz_ - oz) * ivz
        t_fine = jnp.minimum(txn, jnp.minimum(tyn, tzn))

        inb = (ix >= 0) & (ix < res) & (iy >= 0) & (iy < res) & (iz >= 0) & (iz < res)
        cx, cy, cz = ix // coarse_factor, iy // coarse_factor, iz // coarse_factor
        cflat = (cx * cres + cy) * cres + cz
        c_occ = occ_c_flat[jnp.clip(cflat, 0, cres ** 3 - 1)] & inb
        ctx = (lox + (cx + px).astype(jnp.float32) * chx - ox) * ivx
        cty = (loy + (cy + py).astype(jnp.float32) * chy - oy) * ivy
        ctz = (loz + (cz + pz).astype(jnp.float32) * chz - oz) * ivz
        t_coarse = jnp.minimum(ctx, jnp.minimum(cty, ctz))
        t_step = jnp.where(c_occ, t_fine, jnp.maximum(t_coarse, t_cur + eps))

        valid = (jnp.minimum(t_step, t_exit) > t_cur + 1e-7) & hit_box & c_occ
        flat = jnp.where(valid, (ix * res + iy) * res + iz, -1)
        out = (t_cur, jnp.minimum(t_step, t_exit), flat, valid)

        fx = c_occ & (txn <= tyn) & (txn <= tzn)
        fy = c_occ & (~fx) & (tyn <= tzn)
        fz = c_occ & (~fx) & (~fy)
        # empty coarse cell: jump to its exit and re-derive indices there
        tj = t_step + eps
        jx = jnp.clip(jnp.floor((ox + dx * tj - lox) / hx_).astype(jnp.int32), -1, res)
        jy = jnp.clip(jnp.floor((oy + dy * tj - loy) / hy_).astype(jnp.int32), -1, res)
        jz = jnp.clip(jnp.floor((oz + dz * tj - loz) / hz_).astype(jnp.int32), -1, res)
        nix = jnp.where(c_occ, jnp.where(fx, ix + sx, ix), jx)
        niy = jnp.where(c_occ, jnp.where(fy, iy + sy, iy), jy)
        niz = jnp.where(c_occ, jnp.where(fz, iz + sz, iz), jz)
        return (jnp.maximum(t_cur, t_step), nix, niy, niz), out

    init = (t_enter, ijk0[:, 0], ijk0[:, 1], ijk0[:, 2])
    _, ys = jax.lax.scan(body, init, None, length=n_steps)
    t0s, t1s, cells_, valid = ys
    move = lambda a: jnp.moveaxis(a, 0, -1)
    t_starts, t_ends, cells_, mask = move(t0s), move(t1s), move(cells_), move(valid)

    occ = occupancy.reshape(-1).astype(bool)
    mask = mask & occ[jnp.clip(cells_, 0, res ** 3 - 1)] & (cells_ >= 0)
    cells_ = jnp.where(mask, cells_, -1)

    if n_steps < H:
        pad = H - n_steps
        padf = lambda a, v: jnp.pad(a, ((0, 0), (0, pad)), constant_values=v)
        t_starts, t_ends = padf(t_starts, 0.0), padf(t_ends, 0.0)
        cells_, mask = padf(cells_, -1), padf(mask, False)
    elif n_steps > H:
        t_starts, t_ends = t_starts[:, :H], t_ends[:, :H]
        cells_, mask = cells_[:, :H], mask[:, :H]

    reshape = lambda a: a.reshape(*batch_shape, -1)
    return Intervals(
        t_starts=reshape(t_starts),
        t_ends=reshape(t_ends),
        cells=reshape(cells_),
        mask=reshape(mask),
        t_enter=t_enter.reshape(batch_shape),
        t_exit=t_exit.reshape(batch_shape),
    )


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
    step + one FINE cell diagonal (so no occupied cell between probes is
    missed).  Rays where NO probe hits keep the untightened
    [t_enter, t_exit]: an occupied sliver thinner than the probe spacing
    could lie entirely between probes, and collapsing the range would
    silently drop it; the fallback costs nothing (the per-ray sample
    count is fixed and unoccupied samples are masked downstream).

    `occupancy` may be a max-pooled coarse grid (any cubic res <=
    grid.resolution): probes test at the pooled resolution — the same
    semantics as the Pallas tighten kernels — while the pad keeps the
    fine-cell diagonal.

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
    t1 = jnp.where(hit, jnp.minimum(t_last + pad, t_exit), t_exit)
    return t0, t1


def make_coarse_density(density: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Max-pool a [res]^3 density grid by `factor` per axis.  Max (not
    mean) keeps the pooled grid conservative the same way
    make_coarse_occupancy's any() does: pooled(density) > threshold is
    exactly the max-pool of the fine bitfield (bits = ema > threshold
    pointwise, occupancy.py), so support decisions on the pooled density
    agree bit-for-bit with the pooled bitfield."""
    res = density.shape[0]
    if res % factor:
        raise ValueError(f"resolution {res} not divisible by factor {factor}")
    c = res // factor
    return density.reshape(c, factor, c, factor, c, factor).max(axis=(1, 3, 5))


def cell_flat_index(
    positions: jnp.ndarray,
    res: int,
    grid: GridConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(inside, flat_index) nearest-cell arithmetic: [..., 3] ->
    ([...] bool, [...] i32 in [0, res^3)).

    The ONE definition of the floor/clip/flatten cell test shared by
    every lookup flavor (occupancy/density x gather/one-hot-matmul), so
    the documented bit-exact agreement between the flavors cannot drift:
    any change to the boundary or clip rule lands in all of them at
    once.  Out-of-AABB positions clip to the nearest cell; callers mask
    with `inside`."""
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    ijk = jnp.floor((positions - lo) / ((hi - lo) / res)).astype(jnp.int32)
    inside = jnp.all((ijk >= 0) & (ijk < res), axis=-1)
    ijk = jnp.clip(ijk, 0, res - 1)
    flat = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]
    return inside, flat


def density_lookup(
    positions: jnp.ndarray,
    density: jnp.ndarray,
    grid: GridConfig,
) -> jnp.ndarray:
    """Nearest-cell density fetch: [..., 3] -> [...] f32, 0 outside the
    AABB.  Same floor/clip cell arithmetic as occupancy_lookup, but
    returning the cell's VALUE (the occupancy grid's density EMA) rather
    than a bit — the probe for density-weighted CDF sample placement
    (`sampler.placement="density_cdf"`).  Plain gather: the CDF probes
    run per-BIN (P per ray, not per sample), the same count the
    occupancy_cdf probes already pay."""
    res = density.shape[0] if density.ndim == 3 else grid.resolution
    inside, flat = cell_flat_index(positions, res, grid)
    vals = jnp.asarray(density).reshape(-1)[flat].astype(jnp.float32)
    return jnp.where(inside, vals, 0.0)


def density_lookup_matmul(
    positions: jnp.ndarray,
    density: jnp.ndarray,
    grid: GridConfig,
    chunk: int = 32768,
) -> jnp.ndarray:
    """density_lookup via the one-hot MXU matmul (gather pathology fix,
    value flavor): the f32 cell values reshape to a [rows, 128] lane
    table; each probe fetches its row with one [C, rows] @ [rows, 128]
    f32 matmul (exact — a one-hot row copies one value, every other
    product is a true zero) and its lane with an exact one-hot
    multiply-sum.  Unlike the bitfield path there is no 8x byte packing,
    so rows = res^3/128 — practical for the POOLED grids CDF placement
    probes (16^3 -> 32 rows, 32^3 -> 256), not for fine 128^3 grids.
    Bit-exact vs density_lookup (same floor/clip cell arithmetic)."""
    res = density.shape[0] if density.ndim == 3 else grid.resolution
    n = res ** 3

    vals = jnp.asarray(density).reshape(-1).astype(jnp.float32)
    rows = max(1, -(-n // 128))
    if rows * 128 != n:
        vals = jnp.pad(vals, (0, rows * 128 - n))
    tbl = vals.reshape(rows, 128)
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    batch_shape = positions.shape[:-1]
    p = positions.reshape(-1, 3)
    N = p.shape[0]
    pad = (-N) % chunk
    p = jnp.pad(p, ((0, pad), (0, 0)))

    def lookup_chunk(pc):  # [C, 3] -> [C] f32
        inside, flat = cell_flat_index(pc, res, grid)
        row = flat >> 7
        oh_row = (row[:, None] == iota_rows).astype(jnp.float32)
        m = jax.lax.dot_general(
            oh_row, tbl,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, 128] — exact value copies
        oh_lane = ((flat[:, None] & 127) == iota_lane).astype(jnp.float32)
        v = jnp.sum(m * oh_lane, axis=-1)
        return jnp.where(inside, v, 0.0)

    if p.shape[0] == chunk:
        out = lookup_chunk(p)
    else:
        out = jax.lax.map(lookup_chunk, p.reshape(-1, chunk, 3)).reshape(-1)
    return out[:N].reshape(batch_shape)


def density_lookup_fast(
    positions: jnp.ndarray,
    density: jnp.ndarray,
    grid: GridConfig,
) -> jnp.ndarray:
    """density_lookup with the TPU-appropriate formulation: the one-hot
    value matmul for grids small enough that the un-packable f32 row
    table stays MXU-friendly (rows = res^3/128 <= 256 — the pooled
    occupancy_mask_res regime CDF placement probes), the plain gather
    elsewhere (CPU gathers are fast; a fine-grid value fetch would need
    a 16k-row one-hot)."""
    res = density.shape[0] if density.ndim == 3 else grid.resolution
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and res ** 3 <= (1 << 15) and (res ** 3) % 128 == 0:
        return density_lookup_matmul(positions, density, grid)
    return density_lookup(positions, density, grid)


def occupancy_lookup(
    positions: jnp.ndarray,
    occupancy: jnp.ndarray,
    grid: GridConfig,
) -> jnp.ndarray:
    """Point-in-occupied-cell test: [..., 3] -> [...] bool.

    The test resolution comes from the occupancy array itself when it is
    cubic 3-D (so max-pooled coarse grids work directly); flat bitfields
    use grid.resolution."""
    res = occupancy.shape[0] if occupancy.ndim == 3 else grid.resolution
    inside, flat = cell_flat_index(positions, res, grid)
    # jnp.asarray: a host-numpy occupancy (e.g. straight from a restored
    # checkpoint) would otherwise call numpy __array__ on traced indices.
    return inside & jnp.asarray(occupancy).reshape(-1)[flat]


def occupancy_lookup_matmul(
    positions: jnp.ndarray,
    occupancy: jnp.ndarray,
    grid: GridConfig,
    chunk: int = 32768,
) -> jnp.ndarray:
    """occupancy_lookup via MXU gather-as-matmul (TPU fast path).

    XLA's TPU gather costs ~8 ns/element regardless of table size
    (docs/KERNEL_NOTES.md), which makes the per-sample fine-occupancy
    test the single largest non-field cost of the compacted march render
    (~8 ms per 1M samples at 128^3).  This reformulation is the
    apply_hashgrid_onehot trick (fields/hashgrid.py:247) applied to a
    bitfield: pack occupancy bits into BYTES held as a [rows, 512] bf16
    table (byte values 0..255 are exact in bf16), fetch each sample's
    byte with one [C, rows] @ [rows, 512] one-hot matmul (exact: a
    one-hot row copies a single already-bf16 value; all other products
    are true zeros) + a 4-way 128-lane select, then bit-test in int32.

    Bit-for-bit identical to occupancy_lookup (same floor/clip cell
    arithmetic); requires res^3 % (8 * 512 * 512) == 0 in principle but
    any res with res^3 % 4096 == 0 works via row padding.
    """
    res = occupancy.shape[0] if occupancy.ndim == 3 else grid.resolution
    n = res ** 3

    occ_flat = jnp.asarray(occupancy).reshape(-1)
    n_bytes = -(-n // 8)
    rows = max(1, -(-n_bytes // 512))
    bits = occ_flat.astype(jnp.int32)
    if n_bytes * 8 != n or rows * 512 != n_bytes:
        bits = jnp.pad(bits, (0, rows * 512 * 8 - n))
    # [rows*512] bytes, byte j = bits[8j..8j+7], bit b of byte = bit 8j+b
    byte_tbl = (
        (bits.reshape(rows * 512, 8) << jnp.arange(8, dtype=jnp.int32))
        .sum(axis=1, dtype=jnp.int32)
        .reshape(rows, 512)
        .astype(jnp.bfloat16)
    )
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    batch_shape = positions.shape[:-1]
    p = positions.reshape(-1, 3)
    N = p.shape[0]
    pad = (-N) % chunk
    p = jnp.pad(p, ((0, pad), (0, 0)))

    def lookup_chunk(pc):  # [C, 3] -> [C] bool
        inside, flat = cell_flat_index(pc, res, grid)
        byte_idx = flat >> 3
        row = byte_idx >> 9
        col = byte_idx & 511
        oh_row = (row[:, None] == iota_rows).astype(jnp.bfloat16)
        m = jax.lax.dot_general(
            oh_row, byte_tbl,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )  # [C, 512] — exact byte copies
        oh_lane = ((col[:, None] & 127) == iota_lane).astype(jnp.bfloat16)
        grp = col >> 7
        byte = jnp.zeros(pc.shape[:1], jnp.bfloat16)
        for g in range(4):
            sel = jnp.sum(m[:, g * 128 : (g + 1) * 128] * oh_lane, axis=-1,
                          dtype=jnp.bfloat16)
            byte = jnp.where(grp == g, sel, byte)
        word = byte.astype(jnp.int32)  # 0..255 exact
        return inside & (((word >> (flat & 7)) & 1) > 0)

    if p.shape[0] == chunk:
        out = lookup_chunk(p)
    else:
        out = jax.lax.map(lookup_chunk, p.reshape(-1, chunk, 3)).reshape(-1)
    return out[:N].reshape(batch_shape)


def occupancy_lookup_fast(
    positions: jnp.ndarray,
    occupancy: jnp.ndarray,
    grid: GridConfig,
) -> jnp.ndarray:
    """occupancy_lookup with the TPU-appropriate formulation: the one-hot
    matmul path for large tables on TPU (gather pathology), the plain
    gather elsewhere (CPU gathers are fast; small tables don't matter)."""
    res = occupancy.shape[0] if occupancy.ndim == 3 else grid.resolution
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and res ** 3 >= (1 << 18) and (res ** 3) % 4096 == 0:
        return occupancy_lookup_matmul(positions, occupancy, grid)
    return occupancy_lookup(positions, occupancy, grid)
