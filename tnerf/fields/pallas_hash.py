"""Fused Pallas hash-grid encode: the tcnn-HashGrid hot path, in VMEM.

The XLA one-hot formulation (hashgrid.py:apply_hashgrid_onehot) is
HBM-bound, not MXU-bound: the per-corner [C, F*128] dot output round
trips through HBM between the matmul and the lane-select reduction
(~50 MB per corner pass at chunk=8192 — measured 2.6x faster just from
halving its bytes, docs/KERNEL_NOTES.md).  This kernel performs the
whole encode per sample tile without leaving VMEM:

  - all L level tables live in VMEM for the entire launch
    ([L, ROWS<=256, F*128] bf16 — 786 KB at the T=2^14 default);
  - per level, per corner: integer cell/hash arithmetic on the VPU
    (dense collision-free indexing where the level's grid fits, the NGP
    spatial hash otherwise — both chosen STATICALLY per level), a
    [C_t, ROWS] one-hot row matmul on the MXU, and a lane-select mask
    folded into the trilinear weight;
  - the 24 (level, feature) scalars are packed into output lanes by one
    exact f32 matmul per level (the selector matrix is 0/1 and each
    output lane sums <= 8 corner contributions).

Numerics: identical table values to the XLA one-hot path (the one-hot
row matmul selects exactly; 0..255-exact bf16 logic does not apply here
— tables are real-valued, selection is what is exact).  Corner
contributions are summed in lane-major instead of corner-major order, so
results match apply_hashgrid_gather to ~1 ulp f32, not bit-exactly.

Role replaced: tcnn's fused HashGrid encoding kernel
(/root/reference/main.cu:35-69 is the schema; the reference defers the
implementation to the tiny-cuda-nn submodule).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnerf.config import FieldConfig
from tnerf.fields.hashgrid import _PRIMES, level_resolutions

LANES = 128
_TILE = 256  # samples per kernel block (sublane dim of the row matmul)


def _static_level_info(cfg: FieldConfig):
    """Per-level static facts: (res, dense_fits, n1) as python ints."""
    T = 1 << cfg.hash_log2_table_size
    res = level_resolutions(cfg)
    return [
        (int(r), bool((int(r) + 1) ** 3 <= T), int(r) + 1) for r in res
    ]


def _rows_padded(cfg: FieldConfig) -> int:
    T = 1 << cfg.hash_log2_table_size
    return max(T // LANES, LANES)  # pad tiny tables up to one full tile


def pack_tables(tables: jnp.ndarray, cfg: FieldConfig) -> jnp.ndarray:
    """[L*T, F] f32 -> [L, ROWS_P, F*128] compute-dtype VMEM layout
    (lane m = f*128 + (idx & 127), row = idx >> 7; rows beyond T/128 are
    zero and never selected)."""
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    rows = T // LANES
    rows_p = _rows_padded(cfg)
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    tbl = (
        tables.reshape(L, rows, LANES, F)
        .transpose(0, 1, 3, 2)
        .reshape(L, rows, F * LANES)
        .astype(cdtype)
    )
    if rows_p != rows:
        tbl = jnp.pad(tbl, ((0, 0), (0, rows_p - rows), (0, 0)))
    return tbl


def _corner_idx_w(xg, yg, zg, fx, fy, fz, c, dense, n1, T):
    """Corner c of the trilinear cube for ONE level: (idx [C_t,1] i32 in
    [0,T), weight [C_t,1] f32).  xg.. are the level's integer base corner
    (f32 carrying exact small ints), fx.. the fractional parts."""
    ox, oy, oz = (c >> 2) & 1, (c >> 1) & 1, c & 1
    i32 = jnp.int32
    x_ = xg.astype(i32) + ox
    y_ = yg.astype(i32) + oy
    z_ = zg.astype(i32) + oz
    if dense:
        idx = x_ + n1 * (y_ + n1 * z_)
    else:
        idx = (
            x_ * np.int32(np.uint32(_PRIMES[0]))
            ^ y_ * np.int32(np.uint32(_PRIMES[1]))
            ^ z_ * np.int32(np.uint32(_PRIMES[2]))
        )
    idx = idx & (T - 1)
    w = (
        (fx if ox else 1.0 - fx)
        * (fy if oy else 1.0 - fy)
        * (fz if oz else 1.0 - fz)
    )
    return idx, w


def _nearest_idx(xg, yg, zg, fx, fy, fz, dense, n1, T):
    i32 = jnp.int32
    x_ = xg.astype(i32) + (fx >= 0.5).astype(i32)
    y_ = yg.astype(i32) + (fy >= 0.5).astype(i32)
    z_ = zg.astype(i32) + (fz >= 0.5).astype(i32)
    if dense:
        idx = x_ + n1 * (y_ + n1 * z_)
    else:
        idx = (
            x_ * np.int32(np.uint32(_PRIMES[0]))
            ^ y_ * np.int32(np.uint32(_PRIMES[1]))
            ^ z_ * np.int32(np.uint32(_PRIMES[2]))
        )
    return idx & (T - 1)


def _level_geom_kernel(x, y, z, res):
    """In-kernel _level_geometry for one level, matched op-for-op with
    hashgrid._level_geometry (scale, clip, floor in f32)."""
    rf = jnp.float32(res)
    px = jnp.clip(x * rf, 0.0, rf - jnp.float32(1e-4))
    py = jnp.clip(y * rf, 0.0, rf - jnp.float32(1e-4))
    pz = jnp.clip(z * rf, 0.0, rf - jnp.float32(1e-4))
    xg, yg, zg = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    return xg, yg, zg, px - xg, py - yg, pz - zg


def _pack_selector(l, F):
    """[F*128, 128] f32 0/1 selector built from iota compares (cheap to
    materialize in-kernel): column l*F+f sums the f-th 128-lane block
    (row-sum after the lane-select mask)."""
    src = jax.lax.broadcasted_iota(jnp.int32, (F * LANES, LANES), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (F * LANES, LANES), 1)
    return (dst == l * F + src // LANES).astype(jnp.float32)


def _encode_kernel(x_ref, tbl_ref, out_ref, *, cfg_static):
    """One sample tile: x_ref [C_t, 3] f32 positions in [0,1]^3,
    tbl_ref [L, ROWS_P, F*128] cdtype, out_ref [C_t, 128] f32
    (lanes l*F+f carry the feature, the rest zero)."""
    levels, F, T, rows_p, K, cdtype = cfg_static
    L = len(levels)
    c_t = x_ref.shape[0]
    x = x_ref[:, 0:1]
    y = x_ref[:, 1:2]
    z = x_ref[:, 2:3]
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (c_t, rows_p), 1)
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (c_t, LANES), 1)

    out = jnp.zeros((c_t, LANES), jnp.float32)
    for l, (res, dense, n1) in enumerate(levels):
        xg, yg, zg, fx, fy, fz = _level_geom_kernel(x, y, z, res)
        V = jnp.zeros((c_t, F * LANES), jnp.float32)
        corners = (
            [("nearest", None)] if l < K else [("tri", c) for c in range(8)]
        )
        for kind, c in corners:
            if kind == "nearest":
                idx = _nearest_idx(xg, yg, zg, fx, fy, fz, dense, n1, T)
                w = None  # weight 1
            else:
                idx, w = _corner_idx_w(xg, yg, zg, fx, fy, fz, c, dense, n1, T)
            oh_row = (idx >> 7 == iota_row).astype(cdtype)  # [C_t, ROWS_P]
            m = jnp.dot(
                oh_row, tbl_ref[l], preferred_element_type=jnp.float32
            )  # [C_t, F*128]
            oh_lane = ((idx & 127) == iota_lane).astype(jnp.float32)
            mask = jnp.concatenate([oh_lane] * F, axis=1) if F > 1 else oh_lane
            wmask = mask if w is None else w * mask
            V = V + m * wmask
        sel = _pack_selector(l, F)
        out = out + jax.lax.dot_general(
            V, sel, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = out


def _bwd_kernel(x_ref, g_ref, dtbl_ref, *, cfg_static):
    """Accumulating backward: dtbl_ref [L, ROWS_P, F*128] f32 +=
    per-tile cotangent outer products.  g_ref [C_t, 128] f32 (lane l*F+f
    = dL/dfeature)."""
    levels, F, T, rows_p, K, cdtype = cfg_static
    c_t = x_ref.shape[0]
    x = x_ref[:, 0:1]
    y = x_ref[:, 1:2]
    z = x_ref[:, 2:3]
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (c_t, rows_p), 1)
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (c_t, LANES), 1)

    L = len(levels)
    rows_all = dtbl_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dtbl_ref[...] = jnp.zeros(rows_all, jnp.float32)

    for l, (res, dense, n1) in enumerate(levels):
        xg, yg, zg, fx, fy, fz = _level_geom_kernel(x, y, z, res)
        G = jnp.zeros((c_t, F * LANES), jnp.float32)
        corners = (
            [("nearest", None)] if l < K else [("tri", c) for c in range(8)]
        )
        # Rebuild per-corner one-hot rows; accumulate G2 = sum_c
        # oh_row_c^T @ (w_c * g_lf * oh_lane_c) in ONE matmul per corner.
        acc = jnp.zeros((rows_p, F * LANES), jnp.float32)
        for kind, c in corners:
            if kind == "nearest":
                idx = _nearest_idx(xg, yg, zg, fx, fy, fz, dense, n1, T)
                w = None
            else:
                idx, w = _corner_idx_w(xg, yg, zg, fx, fy, fz, c, dense, n1, T)
            oh_row = (idx >> 7 == iota_row).astype(cdtype)
            oh_lane = ((idx & 127) == iota_lane).astype(jnp.float32)
            parts = []
            for f in range(F):
                gf = g_ref[:, l * F + f : l * F + f + 1]  # [C_t, 1]
                gl = gf * oh_lane if w is None else (w * gf) * oh_lane
                parts.append(gl)
            G2 = jnp.concatenate(parts, axis=1) if F > 1 else parts[0]
            acc = acc + jax.lax.dot_general(
                oh_row, G2.astype(cdtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dtbl_ref[l] += acc


def _cfg_static(cfg: FieldConfig):
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return (
        tuple(_static_level_info(cfg)),
        cfg.hash_features_per_level,
        1 << cfg.hash_log2_table_size,
        _rows_padded(cfg),
        cfg.hash_nearest_levels,
        cdtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _pallas_encode(tables, x, cfg, interpret):
    """tables [L*T, F] f32, x [Npad, 3] f32 (Npad % _TILE == 0) ->
    [Npad, L*F] f32."""
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    rows_p = _rows_padded(cfg)
    tbl = pack_tables(tables, cfg)
    n = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_encode_kernel, cfg_static=_cfg_static(cfg)),
        grid=(n // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, rows_p, F * LANES), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        interpret=interpret,
    )(x, tbl)
    return out[:, : L * F]


def _pallas_encode_fwd(tables, x, cfg, interpret):
    return _pallas_encode(tables, x, cfg, interpret), x


def _pallas_encode_bwd(cfg, interpret, x, g):
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    rows = T // LANES
    rows_p = _rows_padded(cfg)
    n = x.shape[0]
    g_pad = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, LANES - L * F)))
    dtbl_m = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg_static=_cfg_static(cfg)),
        grid=(n // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, rows_p, F * LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, rows_p, F * LANES), jnp.float32),
        interpret=interpret,
    )(x, g_pad)
    dtables = (
        dtbl_m[:, :rows]
        .reshape(L, rows, F, LANES)
        .transpose(0, 1, 3, 2)
        .reshape(L * T, F)
    )
    return dtables, jnp.zeros_like(x)


_pallas_encode.defvjp(_pallas_encode_fwd, _pallas_encode_bwd)


def apply_hashgrid_pallas(
    params: dict,
    x01: jnp.ndarray,
    cfg: FieldConfig,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for apply_hashgrid_onehot backed by the fused kernel.

    Positions are treated as non-differentiable (zero cotangent), the
    same contract as the onehot path (resolve_gather_mode docs).
    interpret=None compiles on TPU and interprets elsewhere (Mosaic is
    TPU-only; CPU tests and CPU fallbacks run the interpreter)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = 1 << cfg.hash_log2_table_size
    if T % LANES != 0 or T > (1 << 15):
        raise ValueError(
            f"pallas gather mode needs 128 | T <= 2^15, got T=2^"
            f"{cfg.hash_log2_table_size}"
        )
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    if L * F > LANES:
        raise ValueError(
            f"pallas gather mode packs features into one {LANES}-lane "
            f"row; hash_levels*hash_features_per_level = {L * F} > {LANES}"
        )
    tables = params["tables"]
    batch_shape = x01.shape[:-1]
    x = x01.reshape(-1, 3).astype(jnp.float32)
    n = x.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    y = _pallas_encode(tables, x, cfg, interpret)
    return y[:n].reshape(*batch_shape, L * F).astype(tables.dtype)
