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

import numpy as np

import jax
import jax.numpy as jnp

from tnerf.config import FieldConfig

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


def apply_hashgrid(params: dict, x01: jnp.ndarray, cfg: FieldConfig) -> jnp.ndarray:
    """x01: [..., 3] positions in [0, 1]^3 -> [..., L*F] features.

    The 8 cube corners are processed as a Python loop of gather+FMA
    (one [..., L] index tensor per corner) instead of one vectorized
    [..., L, 8, 3] tensor — at NeRF batch sizes (~1M samples) the
    vectorized form materializes tens of GB and OOMs the compiler, while
    the loop peaks at ~[..., L, F] working set and fuses cleanly.
    """
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    res = level_resolutions(cfg)  # static numpy [L]
    res_j = jnp.asarray(res, jnp.float32)

    # Scale to every level at once: [..., L, 3]
    pos = x01[..., None, :] * res_j[:, None]
    pos = jnp.clip(pos, 0.0, (res_j[:, None] - 1e-4))
    i0f = jnp.floor(pos)
    frac = pos - i0f
    i0 = i0f.astype(jnp.uint32)

    dense_fits = jnp.asarray((res + 1) ** 3 <= T)  # [L] (static values)
    n1 = jnp.asarray(res + 1, jnp.uint32)  # [L]
    level_off = jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T)
    tables = params["tables"]

    out = jnp.zeros((*x01.shape[:-1], L, F), tables.dtype)
    for c in range(8):
        off = ((c >> 2) & 1, (c >> 1) & 1, c & 1)
        x_ = i0[..., 0] + jnp.uint32(off[0])  # [..., L]
        y_ = i0[..., 1] + jnp.uint32(off[1])
        z_ = i0[..., 2] + jnp.uint32(off[2])
        linear = x_ + n1 * (y_ + n1 * z_)
        hashed = (
            x_ * jnp.uint32(_PRIMES[0])
            ^ y_ * jnp.uint32(_PRIMES[1])
            ^ z_ * jnp.uint32(_PRIMES[2])
        )
        idx = (jnp.where(dense_fits, linear, hashed) & jnp.uint32(T - 1)) + level_off
        w = (
            (frac[..., 0] if off[0] else 1.0 - frac[..., 0])
            * (frac[..., 1] if off[1] else 1.0 - frac[..., 1])
            * (frac[..., 2] if off[2] else 1.0 - frac[..., 2])
        )  # [..., L]
        out = out + w[..., None] * tables[idx.astype(jnp.int32)]
    return out.reshape(*x01.shape[:-1], L * F)


def hashgrid_num_params(cfg: FieldConfig) -> int:
    return cfg.hash_levels * (1 << cfg.hash_log2_table_size) * cfg.hash_features_per_level
