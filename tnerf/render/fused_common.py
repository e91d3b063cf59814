"""Shared algebra for the fused Pallas render kernel: the static
frequency-encoding matrices, input-normalization affine, and the
field->kernel feature permutation.

These fold the reference's composite Frequency encoding
(/root/reference/main.cu:47-58, tcnn Frequency semantics) and the
raw-coordinate normalization into static matrices so the kernel feeds
raw (x,y,z,theta,phi) and pays zero runtime normalization ops:
sin((s p + b) f + c) = sin(p (s f) + (b f + c)).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from tnerf.config import FieldConfig, GridConfig

LANES = 128
RAY_COLS = 16  # ox oy oz dx dy dz t_enter dt theta phi (rest pad)


def _norm_affine(grid_cfg: GridConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Per-feature affine (s, b) with p5_normalized = s * p5_raw + b, where
    p5_raw = [x, y, z, theta, phi]: positions map to [-1,1] over the grid
    AABB, angles scale by 1/pi."""
    lo = np.asarray(grid_cfg.aabb_min, np.float32)
    hi = np.asarray(grid_cfg.aabb_max, np.float32)
    ih = 2.0 / (hi - lo)
    s = np.concatenate([ih, [1.0 / math.pi, 1.0 / math.pi]]).astype(np.float32)
    b = np.concatenate([-lo * ih - 1.0, [0.0, 0.0]]).astype(np.float32)
    return s, b


def _encoding_matrices(
    cfg: FieldConfig, s: np.ndarray, b: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Static (A, C) with enc = concat([p5_raw, sin(p5_raw @ A + C)]).

    Columns of A encode (axis, frequency, sin|cos): sin(f x) and
    cos(f x) = sin(f x + pi/2); frequencies pi * 2^k (tcnn Frequency
    semantics, matching tnerf.fields.encodings.frequency_encoding).
    The input-normalization affine (s, b) is FOLDED into A and C so the
    kernel feeds raw coordinates: sin((s p + b) f + c) =
    sin(p (s f) + (b f + c)) — zero runtime normalization ops.
    """
    L3, L2 = cfg.n_frequencies, cfg.n_frequencies_view
    cols = []
    for axis in range(3):
        for k in range(L3):
            for phase in (0.0, 0.5 * math.pi):
                cols.append((axis, math.pi * 2.0 ** k, phase))
    for axis in (3, 4):
        for k in range(L2):
            for phase in (0.0, 0.5 * math.pi):
                cols.append((axis, math.pi * 2.0 ** k, phase))
    n_feat = 5 + len(cols)
    if n_feat > LANES:
        raise ValueError(
            f"encoded width {n_feat} exceeds {LANES} lanes; lower "
            f"n_frequencies (fused kernel supports 3*2*L3 + 2*2*L2 <= 123)"
        )
    A = np.zeros((8, LANES - 5), np.float32)  # 8 sublanes (5 used)
    C = np.zeros((8, LANES - 5), np.float32)  # row 0 used
    for j, (axis, f, phase) in enumerate(cols):
        A[axis, j] = s[axis] * f
        C[0, j] = b[axis] * f + phase
    return A, C, n_feat


def _feature_permutation(cfg: FieldConfig) -> np.ndarray:
    """perm[kernel_feature_index] = field_feature_index.

    The production field (NeRFField fused5d + frequency_encoding) orders
    features [x,y,z, per-dim sin*L cos*L, th,ph, per-dim sin*L cos*L];
    the kernel orders [x,y,z,th,ph, per-axis (sin,cos) freq-interleaved].
    Layer-0 weight rows are permuted at pack time so params trained with
    the XLA path drop straight into the kernel.
    """
    L3, L2 = cfg.n_frequencies, cfg.n_frequencies_view
    pos_w = 3 + 3 * 2 * L3  # field: positions block width
    perm = [0, 1, 2, pos_w + 0, pos_w + 1]  # x y z th ph
    for axis in range(3):
        base = 3 + axis * 2 * L3
        for k in range(L3):
            perm += [base + k, base + L3 + k]  # sin_k, cos_k
    for axis in range(2):
        base = pos_w + 2 + axis * 2 * L2
        for k in range(L2):
            perm += [base + k, base + L2 + k]
    return np.asarray(perm, np.int64)



def compact_rows(keep, rows, cap: int):
    """RAY-compaction pass: pack the kept rows of `rows` [B, K] into a
    static [cap, K] buffer, rank-ordered by position.

    The shared protocol of the march (grid_renderer) and fused
    (pallas_fused2) renderers — one semantics, maintained once:
    - widx[i] = rank of ray i among kept rays, or `cap` for dropped rays;
    - the scatter targets a [cap+1, K] buffer: dropped rays land on the
      sacrificial row `cap` (discarded by the [:cap] slice) and kept rays
      beyond `cap` scatter OUT OF BOUNDS, which JAX drops — over-capacity
      rays therefore read back as background at scatter_back (size `cap`
      well above the scene's object-pixel fraction; see
      RenderConfig.ray_compact_fraction and cli's ray_keep_fraction guard).

    Returns (buf [cap, K], widx [B])."""
    import jax.numpy as jnp

    widx = jnp.where(keep, jnp.cumsum(keep) - 1, cap)
    buf = jnp.zeros((cap + 1, rows.shape[1]), rows.dtype).at[widx].set(rows)[:cap]
    return buf, widx


def scatter_back(out_rows, widx, bg_row):
    """Inverse of compact_rows for the per-ray outputs: out_rows [cap, K]
    rendered from the compacted buffer, bg_row [1, K] the background
    row -> [B, K].  Dropped (widx == cap) and over-capacity (widx > cap)
    rays both clamp onto the appended background row."""
    import jax.numpy as jnp

    cap = out_rows.shape[0]
    return jnp.concatenate([out_rows, bg_row], axis=0)[jnp.minimum(widx, cap)]
