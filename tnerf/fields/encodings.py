"""Input encodings.

Replaces tcnn's encoding zoo (reference main.cu:47-59 configures a
Composite of two Frequency encodings: n_frequencies=10 over the 3 spatial
dims and a frequency encoding over the 2 view dims).

- `frequency_encoding`: sin/cos at octave frequencies — pure jnp; XLA
  fuses it into the surrounding MLP matmul's producer, so a custom kernel
  buys nothing here (the reference needed tcnn because CUDA wouldn't fuse
  this for free).
- The Instant-NGP multiresolution hash grid (BASELINE config 3) lives in
  tnerf.fields.hashgrid.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def frequency_encoding(
    x: jnp.ndarray,
    n_frequencies: int,
    include_input: bool = True,
    scale: float = math.pi,
) -> jnp.ndarray:
    """NeRF positional encoding: [..., D] -> [..., D*(2L (+1))].

    gamma(p) = (sin(2^0 s p), cos(2^0 s p), ..., sin(2^{L-1} s p),
    cos(2^{L-1} s p)) per input dim, optionally prepended with p itself.
    `scale` defaults to pi (tcnn Frequency semantics; inputs normalized to
    [-1, 1] see their full period at octave 0).
    """
    if n_frequencies <= 0:
        return x
    freqs = scale * (2.0 ** jnp.arange(n_frequencies, dtype=jnp.float32))
    xb = x[..., None] * freqs  # [..., D, L]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # [..., D, 2L]
    enc = enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_frequencies)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def frequency_encoding_dim(in_dim: int, n_frequencies: int, include_input: bool = True) -> int:
    return in_dim * 2 * n_frequencies + (in_dim if include_input else 0)
