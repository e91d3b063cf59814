"""Multiresolution hash-grid encoding (Instant-NGP; BASELINE config 3).

Replaces tcnn's HashGrid + its fp16 atomic gradient accumulation with a
pure-JAX formulation: the table gather's VJP is a deterministic
scatter-add (XLA segment-sum), so gradients are exact and reproducible —
no atomics (SURVEY §7.3 hard part 4).

Layout decisions for TPU:
- All L level tables live in ONE [L*T, F] array so the per-sample lookup
  is a single gather with level offsets (one HBM access pattern, not L).
- Levels are computed batched: positions scale to all L resolutions at
  once ([..., L, 3]), corners/weights broadcast over an 8-corner axis —
  everything is static-shape elementwise + one gather + one reduction.
- Hash is the standard spatial hash (pi1=1, pi2=2654435761, pi3=805459861)
  in uint32 wraparound arithmetic; levels whose dense grid fits in the
  table use collision-free linear indexing (chosen statically per level).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tnerf.config import FieldConfig
from tnerf.fields.onehot import (
    onehot_lookup,
    onehot_outer,
    pack_tables,
    unpack_tables,
)

_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(cfg: FieldConfig) -> np.ndarray:
    """Per-level grid resolution N_l = floor(N0 * b^l) with
    b = exp((ln Nmax - ln N0) / (L-1))."""
    L = cfg.hash_levels
    n0, nmax = cfg.hash_base_resolution, cfg.hash_max_resolution
    if L == 1:
        return np.array([n0], np.int64)
    b = float(np.exp((np.log(nmax) - np.log(n0)) / (L - 1)))
    return np.floor(n0 * b ** np.arange(L)).astype(np.int64)


def init_hashgrid(key: jax.Array, cfg: FieldConfig) -> dict:
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    # uniform(-1e-4, 1e-4) init (standard NGP initialization scale)
    tables = jax.random.uniform(key, (L * T, F), jnp.float32, -1e-4, 1e-4)
    return {"tables": tables}


def _level_geometry(x01: jnp.ndarray, cfg: FieldConfig):
    """Shared per-level cell geometry: (i0 [..., L, 3] uint32 base corner,
    frac [..., L, 3] f32, dense_fits [L] bool, n1 [L] uint32)."""
    T = 1 << cfg.hash_log2_table_size
    res = level_resolutions(cfg)  # static numpy [L]
    res_j = jnp.asarray(res, jnp.float32)
    pos = x01[..., None, :] * res_j[:, None]
    pos = jnp.clip(pos, 0.0, (res_j[:, None] - 1e-4))
    i0f = jnp.floor(pos)
    frac = pos - i0f
    i0 = i0f.astype(jnp.uint32)
    dense_fits = jnp.asarray((res + 1) ** 3 <= T)  # [L] (static values)
    n1 = jnp.asarray(res + 1, jnp.uint32)  # [L]
    return i0, frac, dense_fits, n1


def _index_of(x_, y_, z_, dense_fits, n1, T):
    """Within-level table index [..., L] uint32 in [0, T) for integer
    vertex coordinates: collision-free linear indexing where the dense
    grid fits, the NGP spatial hash otherwise."""
    linear = x_ + n1 * (y_ + n1 * z_)
    hashed = (
        x_ * jnp.uint32(_PRIMES[0])
        ^ y_ * jnp.uint32(_PRIMES[1])
        ^ z_ * jnp.uint32(_PRIMES[2])
    )
    return jnp.where(dense_fits, linear, hashed) & jnp.uint32(T - 1)


def _corner_index_weight(c, i0, frac, dense_fits, n1, T):
    """Corner c (0..7) of the trilinear cube: within-level table index
    [..., L] uint32 in [0, T) and interpolation weight [..., L] f32."""
    off = ((c >> 2) & 1, (c >> 1) & 1, c & 1)
    x_ = i0[..., 0] + jnp.uint32(off[0])  # [..., L]
    y_ = i0[..., 1] + jnp.uint32(off[1])
    z_ = i0[..., 2] + jnp.uint32(off[2])
    idx = _index_of(x_, y_, z_, dense_fits, n1, T)
    w = (
        (frac[..., 0] if off[0] else 1.0 - frac[..., 0])
        * (frac[..., 1] if off[1] else 1.0 - frac[..., 1])
        * (frac[..., 2] if off[2] else 1.0 - frac[..., 2])
    )  # [..., L]
    return idx, w


def _nearest_index(i0, frac, dense_fits, n1, T):
    """Nearest-vertex table index [..., L] uint32 (tcnn 'Nearest'
    interpolation: round each coordinate instead of blending 8 corners)."""
    ix = i0 + (frac >= 0.5).astype(jnp.uint32)  # [..., L, 3]
    return _index_of(ix[..., 0], ix[..., 1], ix[..., 2], dense_fits, n1, T)


_warned_gather_downgrade = False


def resolve_gather_mode(cfg: FieldConfig) -> str:
    """'onehot' (MXU matmul-gather) or 'gather' (XLA gather).

    'auto' picks onehot on TPU when each level's table is small enough
    for the one-hot row matmul to be cheap (T <= 2^15 -> at most a
    [256, 128] row block per level); XLA's gather on TPU lowers to a
    ~8 ns/element scalar loop (docs/KERNEL_NOTES.md), so the matmul
    formulation wins by >10x there despite doing 128x the FLOPs.

    NOTE: the onehot path treats sample POSITIONS as non-differentiable
    (zero cotangent) — see apply_hashgrid_onehot.  Nothing in this
    framework differentiates through positions; force
    hash_gather_mode='gather' if an external caller ever needs dL/dx.
    """
    mode = cfg.hash_gather_mode
    if mode != "auto":
        return mode
    T = 1 << cfg.hash_log2_table_size
    # onehot needs at least one full 128-lane row per level (T % 128 == 0).
    if jax.default_backend() == "tpu":
        if 128 <= T <= (1 << 15):
            return "onehot"
        # Loud, once: on TPU the silent fallback costs ~10-20x throughput
        # (58.8k vs 8.5k rays/s measured, docs/KERNEL_NOTES.md).
        global _warned_gather_downgrade
        if not _warned_gather_downgrade:
            _warned_gather_downgrade = True
            import logging

            if T > (1 << 15):
                constraint = (
                    "exceeds the MXU one-hot path's limit (T <= 2^15); "
                    "set field_.hash_log2_table_size<=15 (T=2^14 measured "
                    "40.9 dB on the hard gate — see "
                    "configs/lego_800_hashgrid.json)"
                )
            else:
                constraint = (
                    "is below the MXU one-hot path's minimum (T >= 128 = "
                    "one full 128-lane row per level); set "
                    "field_.hash_log2_table_size>=7"
                )
            logging.getLogger("tnerf").warning(
                "hash_gather_mode=auto: table size T=2^%d %s; falling back "
                "to the XLA gather path, ~10-20x slower on TPU (r4 measured: "
                "encode fwd 14.7 vs 0.72 Msamples/s) — or silence "
                "this by setting hash_gather_mode=gather explicitly.",
                cfg.hash_log2_table_size, constraint,
            )
    return "gather"


def apply_hashgrid(
    params: dict, x01: jnp.ndarray, cfg: FieldConfig, mode: str | None = None
) -> jnp.ndarray:
    """x01: [..., 3] positions in [0, 1]^3 -> [..., L*F] features.

    Dispatches between the XLA-gather formulation and the MXU one-hot
    matmul formulation (see resolve_gather_mode)."""
    if not 0 <= cfg.hash_nearest_levels <= cfg.hash_levels:
        raise ValueError(
            f"hash_nearest_levels={cfg.hash_nearest_levels} must be in "
            f"[0, hash_levels={cfg.hash_levels}]"
        )
    m = mode or resolve_gather_mode(cfg)
    if m == "pallas":
        raise ValueError(
            "hash_gather_mode='pallas' was removed after the round-4 "
            "measurement: the fused VMEM-resident encode kernel LOST to "
            "the MXU one-hot formulation on the real chip (fwd 10.3 vs "
            "14.7 Msamples/s at T=2^14) and its backward ran out of VMEM "
            "at production L=16 (the [L, T/128, F*128] f32 table-grad "
            "block).  See docs/KERNEL_NOTES.md round-4 verdict; use "
            "'onehot' (or 'auto')."
        )
    if m == "onehot":
        return apply_hashgrid_onehot(params, x01, cfg)
    return apply_hashgrid_gather(params, x01, cfg)


def apply_hashgrid_gather(
    params: dict, x01: jnp.ndarray, cfg: FieldConfig
) -> jnp.ndarray:
    """XLA-gather formulation.

    The 8 cube corners are processed as a Python loop of gather+FMA
    (one [..., L] index tensor per corner) instead of one vectorized
    [..., L, 8, 3] tensor — at NeRF batch sizes (~1M samples) the
    vectorized form materializes tens of GB and OOMs the compiler, while
    the loop peaks at ~[..., L, F] working set and fuses cleanly.
    """
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    K = cfg.hash_nearest_levels
    T = 1 << cfg.hash_log2_table_size
    i0, frac, dense_fits, n1 = _level_geometry(x01, cfg)
    level_off = jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T)
    tables = params["tables"]

    parts = []
    if K:  # nearest-interpolated coarse levels: one lookup, weight 1
        idxn = _nearest_index(
            i0[..., :K, :], frac[..., :K, :], dense_fits[:K], n1[:K], T
        )
        parts.append(tables[(idxn + level_off[:K]).astype(jnp.int32)])
    if K < L:
        lin = jnp.zeros((*x01.shape[:-1], L - K, F), tables.dtype)
        geom = (i0[..., K:, :], frac[..., K:, :], dense_fits[K:], n1[K:])
        for c in range(8):
            idx, w = _corner_index_weight(c, *geom, T)
            lin = lin + w[..., None] * tables[(idx + level_off[K:]).astype(jnp.int32)]
        parts.append(lin)
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-2)
    return out.reshape(*x01.shape[:-1], L * F)


def apply_hashgrid_onehot(
    params: dict,
    x01: jnp.ndarray,
    cfg: FieldConfig,
    chunk: int = 8192,
) -> jnp.ndarray:
    """MXU matmul-gather formulation (gather-as-matmul).

    XLA's TPU gather costs ~8 ns/element regardless of table size
    (docs/KERNEL_NOTES.md 'XLA gather pathology') — it made hash-grid
    training 35x slower than the freq-MLP.  This formulation replaces
    every table lookup with systolic-array work, the role tcnn's fused
    HashGrid kernel plays in the reference (main.cu:35-69):

      - each level's table is viewed as [ROWS, 128] lane-tiles
        (ROWS = T/128; requires T <= 2^15 so ROWS <= 256);
      - the ROW of a corner's entry is selected by a one-hot
        [N, ROWS] @ [ROWS, F*128] matmul per level (MXU, exact:
        one-hot rows select without rounding);
      - the LANE is selected by a compare-mask + lane reduction (VPU);
      - the trilinear weight multiplies the selected f32 value.

    Gradients come from plain autodiff: d/d(tables) of a one-hot matmul
    is another matmul — a deterministic dense accumulation, replacing
    both XLA scatter-add AND tcnn's nondeterministic fp16 atomics.

    With float32 tables this matches apply_hashgrid_gather bit-exactly
    for a single chunk (the one-hot matmul contributes exact zeros off
    the selected row; corner accumulation order is identical); under the
    multi-chunk scan XLA's FMA fusion differs at the ~1e-11 level.

    Samples are processed in `chunk`-sized pieces; the dot output
    [L, chunk, F*128] is the peak intermediate (~67 MB bf16 at
    chunk=8192).

    The encoding carries a hand-written VJP: dL/d(tables) is LINEAR in
    the cotangent (dtbl[l,r,m] = sum_c,samples oh_row * (w * g * oh_lane))
    so the backward is ONE matmul per corner with NO forward recompute
    and no stacked residuals (only the positions are saved).  NOTE:
    positions are treated as non-differentiable (zero cotangent) —
    nothing in the framework differentiates through sample positions;
    use hash_gather_mode="gather" if dL/dx is ever needed.
    """
    T = 1 << cfg.hash_log2_table_size
    if T % 128 != 0 or T > (1 << 15):
        raise ValueError(
            f"onehot gather mode needs 128 | T <= 2^15, got T=2^{cfg.hash_log2_table_size}"
        )
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    tables = params["tables"]  # [L*T, F]
    batch_shape = x01.shape[:-1]
    x = x01.reshape(-1, 3)
    n = x.shape[0]
    n_pad = -(-n // chunk) * chunk if n > chunk else n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    y = _onehot_encode(tables, x, cfg, min(chunk, n_pad))
    return y[:n].reshape(*batch_shape, L * F).astype(tables.dtype)


def _onehot_dtypes(cfg: FieldConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _chunk_iter(x, chunk, body, init):
    """scan `body(carry, xc)` over [n_pad/chunk, chunk, ...] pieces; x may
    be a tuple of arrays sharing the leading dim."""
    leaves = x if isinstance(x, tuple) else (x,)
    n = leaves[0].shape[0]
    if n == chunk:
        carry, ys = body(init, x if isinstance(x, tuple) else leaves[0])
        return carry, (ys if ys is None else ys[None])
    stacked = tuple(a.reshape(n // chunk, chunk, *a.shape[1:]) for a in leaves)
    return jax.lax.scan(body, init, stacked if isinstance(x, tuple) else stacked[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _onehot_encode(tables, x, cfg, chunk):
    """tables [L*T, F] f32, x [Npad, 3] (Npad % chunk == 0) -> [Npad, L*F] f32."""
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    cdtype = _onehot_dtypes(cfg)
    # [L, ROWS, F*128] with lane m = f*128 + k  (k = idx & 127).
    # Compute in compute_dtype throughout: EXACT even in bf16 — the
    # one-hot selects a single already-compute_dtype table value; every
    # other product is a true zero.  Measured 2.6x over an f32 dot
    # output (the [L,C,F*128] intermediate halves in bytes).
    tbl_m = pack_tables(tables.reshape(L, T, F), cdtype)
    K = cfg.hash_nearest_levels

    def lookup(tbl_m_sub, idx_t):  # [Ls,ROWS,F*128], [Ls,C] -> [Ls,C,F]
        return onehot_lookup(tbl_m_sub, idx_t, cdtype)

    def encode_chunk(_, xc):  # [C, 3] -> [C, L*F]
        c_sz = xc.shape[0]
        i0, frac, dense_fits, n1 = _level_geometry(xc, cfg)
        parts = []
        if K:  # nearest coarse levels: ONE corner product instead of 8
            idxn = _nearest_index(
                i0[..., :K, :], frac[..., :K, :], dense_fits[:K], n1[:K], T
            )
            parts.append(lookup(tbl_m[:K], idxn.astype(jnp.int32).T)
                         .astype(jnp.float32))
        if K < L:
            out = jnp.zeros((L - K, c_sz, F), jnp.float32)
            geom = (i0[..., K:, :], frac[..., K:, :], dense_fits[K:], n1[K:])
            for c in range(8):
                idx, w = _corner_index_weight(c, *geom, T)
                val = lookup(tbl_m[K:], idx.astype(jnp.int32).T)
                out = out + w.T[:, :, None] * val.astype(jnp.float32)
            parts.append(out)
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return None, out.transpose(1, 0, 2).reshape(c_sz, L * F)

    _, y = _chunk_iter(x, chunk, encode_chunk, None)
    return y.reshape(x.shape[0], L * F)


def _onehot_encode_fwd(tables, x, cfg, chunk):
    return _onehot_encode(tables, x, cfg, chunk), x


def _onehot_encode_bwd(cfg, chunk, x, g):
    """dL/d(tables) with no forward recompute: per corner,
    dtbl_m[l,r,m] = sum_C oh_row[l,C,r] * (w[C,l] * g[l,C,f] * oh_lane[l,C,k])
    — one [L,ROWS,C]x[L,C,F*128] matmul per corner per chunk, accumulated
    in f32 across chunks (deterministic; replaces both XLA scatter-add
    and tcnn's fp16 atomics, main.cu:787 context)."""
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    rows = T // 128
    cdtype = _onehot_dtypes(cfg)
    K = cfg.hash_nearest_levels

    def outer(idx_t, wg):  # [Ls,C] idx, [Ls,C,F] f32 cot -> [Ls,ROWS,F*128]
        return onehot_outer(idx_t, wg, rows, cdtype)

    def bwd_chunk(acc, inp):
        xc, gc = inp  # [C,3], [C, L*F]
        c_sz = xc.shape[0]
        i0, frac, dense_fits, n1 = _level_geometry(xc, cfg)
        g3 = gc.reshape(c_sz, L, F).transpose(1, 0, 2)  # [L, C, F] f32
        if K:  # nearest coarse levels: weight 1, one corner
            idxn = _nearest_index(
                i0[..., :K, :], frac[..., :K, :], dense_fits[:K], n1[:K], T
            )
            acc = acc.at[:K].add(outer(idxn.astype(jnp.int32).T, g3[:K]))
        if K < L:
            lin = jnp.zeros((L - K, rows, F * 128), jnp.float32)
            geom = (i0[..., K:, :], frac[..., K:, :], dense_fits[K:], n1[K:])
            for c in range(8):
                idx, w = _corner_index_weight(c, *geom, T)
                lin = lin + outer(
                    idx.astype(jnp.int32).T, w.T[:, :, None] * g3[K:]
                )
            acc = acc.at[K:].add(lin)
        return acc, None

    dtbl_m, _ = _chunk_iter(
        (x, g), chunk, bwd_chunk, jnp.zeros((L, rows, F * 128), jnp.float32)
    )
    dtables = unpack_tables(dtbl_m, F).reshape(L * T, F)
    # Positions: zero cotangent by design (see apply_hashgrid_onehot doc).
    return dtables, jnp.zeros_like(x)


_onehot_encode.defvjp(_onehot_encode_fwd, _onehot_encode_bwd)


def hashgrid_num_params(cfg: FieldConfig) -> int:
    return cfg.hash_levels * (1 << cfg.hash_log2_table_size) * cfg.hash_features_per_level
