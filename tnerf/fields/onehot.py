"""Shared MXU one-hot table-lookup primitives.

XLA's TPU gather lowers to a ~8 ns/element scalar loop regardless of
table size (docs/KERNEL_NOTES.md "XLA gather pathology"), so every
feature-grid encoding in this framework (hash grid, triplane) replaces
table gathers with systolic-array work: the ROW of an entry is selected
by a one-hot [N, ROWS] @ [ROWS, F*128] matmul (MXU, exact — one-hot rows
select without rounding), the LANE by a compare-mask + 128-lane
reduction (VPU).  This module holds the two primitives both encodings
share; the callers own chunking, interpolation weights, and custom VJPs.

The backward of a one-hot matmul is another matmul — a deterministic
dense accumulation, replacing both XLA scatter-add and tcnn's
nondeterministic fp16 atomics (the role tcnn's fused grid kernels play
in the reference, main.cu:35-69).

Table layout contract: a logical [G, M, F] table group (G independent
tables of M entries x F features, M % 128 == 0) is pre-arranged once as
`tbl_m = [G, M/128, F*128]` with lane m = f*128 + k where k = idx & 127
(see pack_tables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_tables(tables: jnp.ndarray, cdtype) -> jnp.ndarray:
    """[G, M, F] (M % 128 == 0) -> [G, M/128, F*128] with lane m = f*128+k."""
    G, M, F = tables.shape
    rows = M // 128
    return (
        tables.reshape(G, rows, 128, F)
        .transpose(0, 1, 3, 2)
        .reshape(G, rows, F * 128)
        .astype(cdtype)
    )


def unpack_tables(tbl_m: jnp.ndarray, F: int) -> jnp.ndarray:
    """Inverse of pack_tables: [G, ROWS, F*128] -> [G, ROWS*128, F]."""
    G, rows, _ = tbl_m.shape
    return (
        tbl_m.reshape(G, rows, F, 128)
        .transpose(0, 1, 3, 2)
        .reshape(G, rows * 128, F)
    )


def onehot_lookup(tbl_m: jnp.ndarray, idx_t: jnp.ndarray, cdtype) -> jnp.ndarray:
    """tbl_m [G, ROWS, F*128] (pack_tables layout), idx_t [G, C] int32 in
    [0, ROWS*128) -> looked-up values [G, C, F] in cdtype.

    Exact even in bf16: the one-hot selects a single already-cdtype table
    value; every other product is a true zero.
    """
    rows = tbl_m.shape[1]
    F = tbl_m.shape[2] // 128
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rows), 2)
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    oh_row = (idx_t[:, :, None] >> 7 == iota_rows).astype(cdtype)
    m = jax.lax.dot_general(
        oh_row,
        tbl_m,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=cdtype,
    )  # [G, C, F*128]
    oh_lane = ((idx_t[:, :, None] & 127) == iota_lane).astype(cdtype)
    # Per-feature static 128-lane slices (NOT a [G,C,F,128] reshape: the
    # trailing [F,128] dims force degenerate T(2,128) Mosaic tiling —
    # measured 10 ms per pass at hash-grid sizes).
    return jnp.stack(
        [
            jnp.sum(m[:, :, f * 128 : (f + 1) * 128] * oh_lane,
                    axis=-1, dtype=cdtype)
            for f in range(F)
        ],
        axis=-1,
    )  # [G, C, F] — exact: one nonzero per (sample, table, feature)


def onehot_outer(idx_t: jnp.ndarray, wg: jnp.ndarray, rows: int, cdtype) -> jnp.ndarray:
    """Transpose of onehot_lookup for the backward pass: scatter-add the
    cotangents `wg` [G, C, F] f32 into table layout at `idx_t` [G, C] —
    returns d(tbl_m) [G, ROWS, F*128] f32 (one matmul, no scatter)."""
    F = wg.shape[-1]
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rows), 2)
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    oh_row = (idx_t[:, :, None] >> 7 == iota_rows).astype(cdtype)
    oh_lane = ((idx_t[:, :, None] & 127) == iota_lane).astype(cdtype)
    # Build [G, C, F*128] by per-feature concat of [G,C,128] tiles (a
    # [G,C,F,128] broadcast-reshape lowers to T(2,128) tiling: 10 ms per
    # fusion at hash-grid sizes, 82 ms/step total).
    G2 = jnp.concatenate(
        [wg[:, :, f : f + 1].astype(cdtype) * oh_lane for f in range(F)],
        axis=-1,
    )  # [G, C, F*128]
    return jax.lax.dot_general(
        oh_row,
        G2,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, ROWS, F*128]
