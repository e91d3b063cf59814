"""Pallas DDA traversal kernel: the RT-core replacement at scale.

The lax.scan walk (tnerf/grid/traversal.py) is algorithmically right but
HBM-bound at 128^3: every scan step round-trips the carry plus ~10
loop-invariant per-ray arrays through HBM (measured ~78 us/step at 640K
rays — ~30 ms/launch), and an occupancy gather inside the scan is ~67x
worse (XLA per-step gather pathology, measured).  This kernel keeps the
ENTIRE walk on-chip: rays live on lanes ([8,128] = 1024 rays per block),
the DDA state never leaves vector registers/VMEM, and the only HBM
traffic is ray inputs once and emitted intervals once.

Empty-space skipping (the OptiX BVH's job, reference
rtx/src/rtxFunctions.cpp:293-351): a max-pooled coarse occupancy bitfield
is packed into 32-bit words — a 16^3 coarse grid is 4096 bits = exactly
128 words = ONE 128-lane row — and consulted per step with the one
in-kernel gather Mosaic supports: same-shape `take_along_axis(axis=1)`
(within-row lane gather) + bit shifts.  Inside an occupied coarse cell
the walk advances one fine cell (emitting its interval); inside an empty
one it jumps straight to the coarse exit plane.

Output layout is steps-major ([steps, rays]) as written by the kernel;
`traverse_grid_pallas` converts to the standard rays-major Intervals
(one XLA transpose) and applies the fine-grained occupancy mask in bulk
(bulk gathers are fine; per-step ones are not).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnerf.config import GridConfig
from tnerf.grid.traversal import Intervals, make_coarse_occupancy, ray_aabb

_SUB = 8          # sublanes per block
_LANES = 128
_BLOCK = _SUB * _LANES  # rays per kernel block


def pack_coarse_words(occ_coarse: jnp.ndarray) -> jnp.ndarray:
    """[c,c,c] bool -> [8, n_words] i32 bitfield (flat index x*c^2+y*c+z,
    bit i of word i//32), rows identical (broadcast for the sublane dim)."""
    c = occ_coarse.shape[0]
    flat = occ_coarse.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    n_words = max(-(-n // 32), _LANES)  # at least one full lane row
    bits = jnp.zeros((n_words * 32,), jnp.int32).at[:n].set(flat)
    words = (bits.reshape(n_words, 32) << jnp.arange(32, dtype=jnp.int32)).sum(
        axis=1, dtype=jnp.int32
    )
    return jnp.broadcast_to(words[None, :], (_SUB, n_words))


def _dda_kernel(
    ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, te_ref, tx_ref, words_ref,
    t0_out, cell_out,
    *, res, cfactor, steps, lo, cell_size, use_occupancy,
):
    f32 = jnp.float32
    i32 = jnp.int32
    lox, loy, loz = (f32(v) for v in lo)
    hx, hy, hz = (f32(v) for v in cell_size)
    cres = res // cfactor
    clog = int(np.log2(cfactor))
    assert 1 << clog == cfactor, "coarse factor must be a power of two"
    chx, chy, chz = hx * cfactor, hy * cfactor, hz * cfactor
    eps = f32(1e-6)

    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    iv_x, iv_y, iv_z = ivx[:], ivy[:], ivz[:]
    te = te_ref[:]
    tx = tx_ref[:]
    hit_box = tx > te
    px = (iv_x > 0).astype(i32)
    py = (iv_y > 0).astype(i32)
    pz = (iv_z > 0).astype(i32)
    sx = 2 * px - 1
    sy = 2 * py - 1
    sz = 2 * pz - 1
    if use_occupancy:
        words = words_ref[:]  # [8, n_words] i32; n_words <= 128 lanes

    # entry cell
    p0x = o_x + d_x * (te + eps)
    p0y = o_y + d_y * (te + eps)
    p0z = o_z + d_z * (te + eps)
    ix0 = jnp.clip(jnp.floor((p0x - lox) / hx).astype(i32), 0, res - 1)
    iy0 = jnp.clip(jnp.floor((p0y - loy) / hy).astype(i32), 0, res - 1)
    iz0 = jnp.clip(jnp.floor((p0z - loz) / hz).astype(i32), 0, res - 1)

    def step_fn(s, carry):
        t_cur, ix, iy, iz = carry
        txn = (lox + (ix + px).astype(f32) * hx - o_x) * iv_x
        tyn = (loy + (iy + py).astype(f32) * hy - o_y) * iv_y
        tzn = (loz + (iz + pz).astype(f32) * hz - o_z) * iv_z
        t_fine = jnp.minimum(txn, jnp.minimum(tyn, tzn))

        inb = (
            (ix >= 0) & (ix < res) & (iy >= 0) & (iy < res)
            & (iz >= 0) & (iz < res)
        )
        if use_occupancy:
            cx, cy, cz = ix >> clog, iy >> clog, iz >> clog
            cflat = (cx * cres + cy) * cres + cz
            cflat = jnp.clip(cflat, 0, cres ** 3 - 1)
            word_idx = cflat >> 5
            bit = cflat & 31
            w = jnp.take_along_axis(words, word_idx, axis=1)
            c_occ = (((w >> bit) & 1) > 0) & inb
            ctx = (lox + (cx + px).astype(f32) * chx - o_x) * iv_x
            cty = (loy + (cy + py).astype(f32) * chy - o_y) * iv_y
            ctz = (loz + (cz + pz).astype(f32) * chz - o_z) * iv_z
            t_coarse = jnp.minimum(ctx, jnp.minimum(cty, ctz))
            t_step = jnp.where(c_occ, t_fine, jnp.maximum(t_coarse, t_cur + eps))
        else:
            c_occ = inb
            t_step = t_fine

        valid = (jnp.minimum(t_step, tx) > t_cur + f32(1e-7)) & hit_box & c_occ
        flat = jnp.where(valid, (ix * res + iy) * res + iz, -1)
        t0_out[s] = t_cur
        cell_out[s] = flat

        fx = c_occ & (txn <= tyn) & (txn <= tzn)
        fy = c_occ & (~fx) & (tyn <= tzn)
        fz = c_occ & (~fx) & (~fy)
        nix = jnp.where(fx, ix + sx, ix)
        niy = jnp.where(fy, iy + sy, iy)
        niz = jnp.where(fz, iz + sz, iz)
        if use_occupancy:
            tj = t_step + eps
            jx = jnp.clip(jnp.floor((o_x + d_x * tj - lox) / hx).astype(i32), -1, res)
            jy = jnp.clip(jnp.floor((o_y + d_y * tj - loy) / hy).astype(i32), -1, res)
            jz = jnp.clip(jnp.floor((o_z + d_z * tj - loz) / hz).astype(i32), -1, res)
            nix = jnp.where(c_occ, nix, jx)
            niy = jnp.where(c_occ, niy, jy)
            niz = jnp.where(c_occ, niz, jz)
        return jnp.maximum(t_cur, t_step), nix, niy, niz

    jax.lax.fori_loop(0, steps, step_fn, (te, ix0, iy0, iz0))


def march_pallas_raw(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    grid: GridConfig,
    occupancy: Optional[jnp.ndarray] = None,
    coarse_factor: int = 8,
    steps: Optional[int] = None,
    interpret: bool = False,
):
    """Run the DDA kernel; returns steps-major raw outputs
    (t0 [n_steps, B], cells [n_steps, B], t_enter [B], t_exit [B]).
    B is padded to a multiple of 1024 internally."""
    res = grid.resolution
    n_steps = steps if steps is not None else 3 * res
    lo = np.asarray(grid.aabb_min, np.float32)
    hi = np.asarray(grid.aabb_max, np.float32)
    cell = (hi - lo) / res

    B = origins.shape[0]
    pad = (-B) % _BLOCK
    o = jnp.pad(origins.astype(jnp.float32), ((0, pad), (0, 0)))
    d = jnp.pad(directions.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=1.0)
    Bp = B + pad
    n_rows = Bp // _LANES

    t_enter, t_exit = ray_aabb(o, d, grid.aabb_min, grid.aabb_max)
    t_enter = jnp.maximum(t_enter, 0.0)
    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    inv_d = 1.0 / d_safe

    as_rows = lambda a: a.reshape(n_rows, _LANES)
    ins = [
        as_rows(o[:, 0]), as_rows(o[:, 1]), as_rows(o[:, 2]),
        as_rows(d_safe[:, 0]), as_rows(d_safe[:, 1]), as_rows(d_safe[:, 2]),
        as_rows(inv_d[:, 0]), as_rows(inv_d[:, 1]), as_rows(inv_d[:, 2]),
        as_rows(t_enter), as_rows(t_exit),
    ]
    use_occ = occupancy is not None
    if use_occ:
        occ_coarse = make_coarse_occupancy(
            occupancy.reshape(res, res, res), coarse_factor
        )
        words = pack_coarse_words(occ_coarse)
        if words.shape[1] > _LANES:
            raise ValueError(
                f"coarse grid {res // coarse_factor}^3 needs {words.shape[1]} "
                f"words > {_LANES} lanes; raise coarse_factor"
            )
        words = jnp.pad(words, ((0, 0), (0, _LANES - words.shape[1])))
    else:
        words = jnp.zeros((_SUB, _LANES), jnp.int32)

    kernel = functools.partial(
        _dda_kernel,
        res=res, cfactor=coarse_factor, steps=n_steps,
        lo=tuple(lo), cell_size=tuple(cell), use_occupancy=use_occ,
    )
    n_blocks = Bp // _BLOCK
    ray_spec = pl.BlockSpec((_SUB, _LANES), lambda rb: (rb, 0), memory_space=pltpu.VMEM)
    t0s, cells = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[ray_spec] * 11 + [
            pl.BlockSpec((_SUB, _LANES), lambda rb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_steps, _SUB, _LANES), lambda rb: (0, rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_steps, _SUB, _LANES), lambda rb: (0, rb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, n_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, n_rows, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(*ins, words)
    flat = lambda a: a.reshape(n_steps, Bp)[:, :B]
    return flat(t0s), flat(cells), t_enter[:B], t_exit[:B]


def traverse_grid_pallas(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    grid: GridConfig,
    occupancy: Optional[jnp.ndarray] = None,
    coarse_factor: int = 8,
    max_hits: Optional[int] = None,
    steps: Optional[int] = None,
    interpret: bool = False,
) -> Intervals:
    """Kernel-backed drop-in for traverse_grid / traverse_grid_twolevel:
    same Intervals contract (rays-major, masked, fine-occupancy applied)."""
    res = grid.resolution
    H = max_hits if max_hits is not None else grid.effective_max_hits
    n_steps = steps if steps is not None else min(H, 3 * res)

    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)
    # One sentinel step beyond the budget: the walk's t is monotone and
    # slot s ends where slot s+1 starts, so the extra step's t0 is the
    # TRUE exit of the last budgeted cell.  (Using t_exit there instead
    # would stretch the final interval across everything the truncated
    # walk never visited — up to ~12x the cell width.)
    t0s, cells, t_enter, t_exit = march_pallas_raw(
        o, d, grid, occupancy=occupancy, coarse_factor=coarse_factor,
        steps=n_steps + 1, interpret=interpret,
    )
    t0s = t0s.T                       # [B, n_steps+1]
    cells = cells.T[:, :n_steps]
    t1s = jnp.minimum(t0s[:, 1:], t_exit[:, None])
    t0s = t0s[:, :n_steps]
    mask = cells >= 0
    if occupancy is not None:
        occ = occupancy.reshape(-1).astype(bool)
        mask = mask & occ[jnp.clip(cells, 0, res ** 3 - 1)]
    mask = mask & (t1s > t0s)
    cells = jnp.where(mask, cells, -1)

    if n_steps < H:
        padn = H - n_steps
        padf = lambda a, v: jnp.pad(a, ((0, 0), (0, padn)), constant_values=v)
        t0s, t1s = padf(t0s, 0.0), padf(t1s, 0.0)
        cells, mask = padf(cells, -1), padf(mask, False)
    elif n_steps > H:
        t0s, t1s, cells, mask = (a[:, :H] for a in (t0s, t1s, cells, mask))

    reshape = lambda a: a.reshape(*batch_shape, -1)
    return Intervals(
        t_starts=reshape(jnp.where(mask, t0s, 0.0)),
        t_ends=reshape(jnp.where(mask, t1s, 0.0)),
        cells=reshape(cells),
        mask=reshape(mask),
        t_enter=t_enter.reshape(batch_shape),
        t_exit=t_exit.reshape(batch_shape),
    )


# --------------------------------------------------------------------------
# Occupancy range tightening (Pallas): per-ray [t0, t1] of the occupied
# span, probe-based, coarse bitfield in VMEM.  The XLA tightened_range
# (traversal.py) gathers occupancy per probe at ~8 ns/element — ~330 ms
# for a full 800x800 frame; this kernel does the same probes as [8,128]
# lane arithmetic + the within-row take_along_axis bit test (the pattern
# of pallas_fused2._coarse_mask), ~1000x cheaper.
# --------------------------------------------------------------------------

def _probe_tighten(o_xyz, d_xyz, te, tx, occ_test, *, probes, pad_diag):
    """Shared tighten probe phase of _tighten_kernel and
    _tighten_mask_kernel, parameterized by the in-kernel occupancy test
    `occ_test(x, y, z) -> bool` (both use the row-selected
    pack_words_rows bitfield via _occ_bit_rows since round 5).

    Match the XLA tightened_range arithmetic op-for-op (association
    included): positions must agree bit-for-bit with the train-time
    path or boundary samples flip masks.  Any parity fix lands here
    ONCE and both kernels inherit it."""
    f32 = jnp.float32
    o_x, o_y, o_z = o_xyz
    d_x, d_y, d_z = d_xyz
    span = jnp.maximum(tx - te, 0.0)
    step = span / f32(probes)
    big = f32(3.0e38)

    def probe(i, carry):
        tf, tl = carry
        t = te + span * ((i.astype(f32) + 0.5) / f32(probes))
        occ = occ_test(o_x + d_x * t, o_y + d_y * t, o_z + d_z * t) & (span > 0)
        tf = jnp.minimum(tf, jnp.where(occ, t, big))
        tl = jnp.maximum(tl, jnp.where(occ, t, -big))
        return tf, tl

    init = (jnp.full_like(te, big), jnp.full_like(te, -big))
    tf, tl = jax.lax.fori_loop(0, probes, probe, init)
    hit = tl >= tf
    pad = step + f32(pad_diag)
    t0 = jnp.where(hit, jnp.maximum(tf - pad, te), te)
    t1 = jnp.where(hit, jnp.minimum(tl + pad, tx), tx)
    return t0, t1


def _tighten_kernel(
    ox, oy, oz, dx, dy, dz, te_ref, tx_ref, words_ref,
    t0_out, t1_out,
    *, res_c, rows_used, lo, cell_c, probes, pad_diag,
):
    words = words_ref[:]

    def occ_test(x, y, z):
        return _occ_bit_rows(
            x, y, z, words,
            res_c=res_c, rows_used=rows_used, lo=lo, cell_c=cell_c,
        )

    t0, t1 = _probe_tighten(
        (ox[:], oy[:], oz[:]), (dx[:], dy[:], dz[:]), te_ref[:], tx_ref[:],
        occ_test, probes=probes, pad_diag=pad_diag,
    )
    t0_out[:] = t0
    t1_out[:] = t1


def pack_words_rows(occ_coarse: jnp.ndarray) -> jnp.ndarray:
    """[c,c,c] bool -> [8, 128] i32 bitfield holding up to 32768 bits
    (c <= 32): bit i of word i//32, word w at [w >> 7, w & 127].  Unlike
    pack_coarse_words (identical rows, c <= 16), rows are DISTINCT —
    in-kernel lookups row-select with a short static select chain."""
    c = occ_coarse.shape[0]
    n = c * c * c
    cap = _SUB * _LANES * 32
    if n > cap:
        raise ValueError(f"coarse grid {c}^3 = {n} bits exceeds {cap}")
    flat = occ_coarse.reshape(-1).astype(jnp.int32)
    bits = jnp.zeros((cap,), jnp.int32).at[:n].set(flat)
    words = (bits.reshape(_SUB * _LANES, 32) << jnp.arange(32, dtype=jnp.int32)).sum(
        axis=1, dtype=jnp.int32
    )
    return words.reshape(_SUB, _LANES)


def _occ_bit_rows(x, y, z, words, *, res_c, rows_used, lo, cell_c):
    """In-kernel point test against a pack_words_rows bitfield: [8,128]
    lane arithmetic + one within-row take_along_axis per used word-row
    (the only gather Mosaic has), rows resolved by a static select chain.

    Divides by the cell size (not multiply-by-reciprocal) so cell ids
    match traversal.occupancy_lookup bit-for-bit at cell boundaries —
    train-time XLA masks and eval-time kernel masks must agree."""
    f32, i32 = jnp.float32, jnp.int32
    ci = jnp.clip(jnp.floor((x - f32(lo[0])) / f32(cell_c[0])).astype(i32), 0, res_c - 1)
    cj = jnp.clip(jnp.floor((y - f32(lo[1])) / f32(cell_c[1])).astype(i32), 0, res_c - 1)
    ck = jnp.clip(jnp.floor((z - f32(lo[2])) / f32(cell_c[2])).astype(i32), 0, res_c - 1)
    cflat = (ci * res_c + cj) * res_c + ck
    widx = cflat >> 5
    lane = widx & (_LANES - 1)
    w = jnp.take_along_axis(
        jnp.broadcast_to(words[0:1, :], lane.shape), lane, axis=1
    )
    if rows_used > 1:
        row = widx >> 7
        for r in range(1, rows_used):
            wr = jnp.take_along_axis(
                jnp.broadcast_to(words[r : r + 1, :], lane.shape), lane, axis=1
            )
            w = jnp.where(row == r, wr, w)
    return ((w >> (cflat & 31)) & 1) > 0


def _tighten_mask_kernel(
    ox, oy, oz, dx, dy, dz, te_ref, tx_ref, words_ref,
    t0_out, t1_out, mask_out,
    *, res_c, rows_used, lo, cell_c, probes, pad_diag, n_samples,
):
    f32 = jnp.float32
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    words = words_ref[:]

    def occ_test(x, y, z):
        return _occ_bit_rows(
            x, y, z, words,
            res_c=res_c, rows_used=rows_used, lo=lo, cell_c=cell_c,
        )

    t0, t1 = _probe_tighten(
        (o_x, o_y, o_z), (d_x, d_y, d_z), te_ref[:], tx_ref[:],
        occ_test, probes=probes, pad_diag=pad_diag,
    )
    t0_out[:] = t0
    t1_out[:] = t1

    # Phase 2: per-sample occupancy mask at the midpoint quadrature the
    # eval renderer uses (t_s = t0 + (s+0.5)*(t1-t0)/S).
    dt = (t1 - t0) / f32(n_samples)

    def emit(s, _):
        t = t0 + dt * (s.astype(f32) + 0.5)
        occ = _occ_bit_rows(
            o_x + d_x * t, o_y + d_y * t, o_z + d_z * t, words,
            res_c=res_c, rows_used=rows_used, lo=lo, cell_c=cell_c,
        ) & (t1 > t0)
        mask_out[s] = occ.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_samples, emit, 0)


def tighten_sample_mask_pallas(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_enter: jnp.ndarray,
    t_exit: jnp.ndarray,
    occ_coarse: jnp.ndarray,
    n_samples: int,
    grid: GridConfig,
    probes: int = 256,
    interpret: bool = False,
):
    """Fused occupancy-range tightening + per-sample coarse occupancy
    mask for the march renderer's midpoint quadrature.

    One kernel replaces the two XLA stages that dominate the unfused
    render frame (measured ~21% tightened_range probes + ~40% per-sample
    occupancy_lookup gathers at ~8 ns/element, docs/ROUND2.md): probes
    the pooled occ_coarse [c<=32]^3 bitfield (VMEM-resident, bit tests
    via within-row take_along_axis), shrinks [t_enter, t_exit] to the
    occupied span (tightened_range contract: probe-miss rays keep the
    full span; hits padded by one probe step + one fine-cell diagonal),
    then tests the S midpoint samples of the tightened span.

    Returns (t0 [B], t1 [B], mask [B, S] bool).  Training-time sampling
    uses the same pooled grid through the XLA path (exact at jittered
    positions) so train and eval share one mask semantics — see
    tnerf/render/grid_renderer.py.
    """
    res_c = occ_coarse.shape[0]
    rows_used = max(1, -(-(res_c ** 3) // (32 * _LANES)))
    words = pack_words_rows(occ_coarse)
    lo = np.asarray(grid.aabb_min, np.float32)
    hi = np.asarray(grid.aabb_max, np.float32)
    cell_c = (hi - lo) / res_c
    fine_diag = float(np.linalg.norm((hi - lo) / grid.resolution))

    B = origins.shape[0]
    pad = (-B) % _BLOCK
    o = jnp.pad(origins.astype(jnp.float32), ((0, pad), (0, 0)))
    d = jnp.pad(directions.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=1.0)
    te = jnp.pad(t_enter.astype(jnp.float32), (0, pad))
    tx = jnp.pad(t_exit.astype(jnp.float32), (0, pad))
    Bp = B + pad
    n_rows = Bp // _LANES
    as_rows = lambda a: a.reshape(n_rows, _LANES)

    kernel = functools.partial(
        _tighten_mask_kernel,
        res_c=res_c, rows_used=rows_used, lo=tuple(lo), cell_c=tuple(cell_c),
        probes=probes, pad_diag=fine_diag, n_samples=n_samples,
    )
    ray_spec = pl.BlockSpec((_SUB, _LANES), lambda rb: (rb, 0), memory_space=pltpu.VMEM)
    t0, t1, mask = pl.pallas_call(
        kernel,
        grid=(Bp // _BLOCK,),
        in_specs=[ray_spec] * 8 + [
            pl.BlockSpec((_SUB, _LANES), lambda rb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            ray_spec,
            ray_spec,
            pl.BlockSpec((n_samples, _SUB, _LANES), lambda rb: (0, rb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_samples, n_rows, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        as_rows(o[:, 0]), as_rows(o[:, 1]), as_rows(o[:, 2]),
        as_rows(d[:, 0]), as_rows(d[:, 1]), as_rows(d[:, 2]),
        as_rows(te), as_rows(tx), words,
    )
    mask_bs = mask.reshape(n_samples, Bp).T[:B].astype(bool)
    return t0.reshape(Bp)[:B], t1.reshape(Bp)[:B], mask_bs


def tighten_range_pallas(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_enter: jnp.ndarray,
    t_exit: jnp.ndarray,
    words: jnp.ndarray,
    res_c: int,
    grid: GridConfig,
    probes: int = 256,
    interpret: bool = False,
):
    """Shrink per-ray [t_enter, t_exit] to the span of occupied COARSE
    cells (same contract as traversal.tightened_range, coarse-grained:
    rays with no occupied probe keep the full span; hits are padded by
    one probe step + one fine-cell diagonal).

    words: [8, 128] i32 coarse bitfield in pack_words_rows layout
    (rows DISTINCT, word w at [w >> 7, w & 127]) for a res_c^3 grid,
    res_c <= 32; pallas_fused2.pack_occupancy_words produces it.
    """
    lo = np.asarray(grid.aabb_min, np.float32)
    hi = np.asarray(grid.aabb_max, np.float32)
    cell_c = (hi - lo) / res_c
    rows_used = max(1, -(-(res_c ** 3) // (32 * _LANES)))
    fine_diag = float(np.linalg.norm((hi - lo) / grid.resolution))

    B = origins.shape[0]
    pad = (-B) % _BLOCK
    o = jnp.pad(origins.astype(jnp.float32), ((0, pad), (0, 0)))
    d = jnp.pad(directions.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=1.0)
    te = jnp.pad(t_enter.astype(jnp.float32), (0, pad))
    tx = jnp.pad(t_exit.astype(jnp.float32), (0, pad))
    Bp = B + pad
    n_rows = Bp // _LANES
    as_rows = lambda a: a.reshape(n_rows, _LANES)
    if words.shape[1] < _LANES:
        words = jnp.pad(words, ((0, 0), (0, _LANES - words.shape[1])))

    kernel = functools.partial(
        _tighten_kernel,
        res_c=res_c, rows_used=rows_used, lo=tuple(lo), cell_c=tuple(cell_c),
        probes=probes, pad_diag=fine_diag,
    )
    ray_spec = pl.BlockSpec((_SUB, _LANES), lambda rb: (rb, 0), memory_space=pltpu.VMEM)
    t0, t1 = pl.pallas_call(
        kernel,
        grid=(Bp // _BLOCK,),
        in_specs=[ray_spec] * 8 + [
            pl.BlockSpec((_SUB, _LANES), lambda rb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        as_rows(o[:, 0]), as_rows(o[:, 1]), as_rows(o[:, 2]),
        as_rows(d[:, 0]), as_rows(d[:, 1]), as_rows(d[:, 2]),
        as_rows(te), as_rows(tx), words,
    )
    return t0.reshape(Bp)[:B], t1.reshape(Bp)[:B]
