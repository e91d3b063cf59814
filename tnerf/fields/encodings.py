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

import jax
import jax.numpy as jnp


def frequency_encoding(
    x: jnp.ndarray,
    n_frequencies: int,
    include_input: bool = True,
    scale: float = math.pi,
    window: "jnp.ndarray | None" = None,
) -> jnp.ndarray:
    """NeRF positional encoding: [..., D] -> [..., D*(2L (+1))].

    gamma(p) = (sin(2^0 s p), cos(2^0 s p), ..., sin(2^{L-1} s p),
    cos(2^{L-1} s p)) per input dim, optionally prepended with p itself.
    `scale` defaults to pi (tcnn Frequency semantics; inputs normalized to
    [-1, 1] see their full period at octave 0).

    window: optional [L] per-band weights (BARF coarse-to-fine
    annealing, `barf_window` — each band's sin AND cos scale by its
    weight; the raw input passthrough is never windowed).
    """
    if n_frequencies <= 0:
        return x
    freqs = scale * (2.0 ** jnp.arange(n_frequencies, dtype=jnp.float32))
    xb = x[..., None] * freqs  # [..., D, L]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # [..., D, 2L]
    if window is not None:
        enc = enc * jnp.concatenate([window, window])
    enc = enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_frequencies)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def barf_window(alpha: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    """BARF's coarse-to-fine band weights (Lin et al., ICCV 2021 eq. 14):
    alpha in [0, 1] sweeps the active bands from none to all — band k's
    weight ramps smoothly ((1 - cos(pi t))/2) while alpha*L crosses
    [k, k+1].  High bands of the positional encoding make the pose loss
    landscape rugged; annealing them in is what makes joint
    pose-and-field optimization recover poses metrically
    (train.freq_anneal_steps)."""
    k = jnp.arange(n_frequencies, dtype=jnp.float32)
    t = jnp.clip(alpha * n_frequencies - k, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * t))


def frequency_encoding_dim(in_dim: int, n_frequencies: int, include_input: bool = True) -> int:
    return in_dim * 2 * n_frequencies + (in_dim if include_input else 0)


def sh_encoding(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical-harmonics basis of view directions: [..., 3] ->
    [..., degree**2] (tcnn SphericalHarmonics semantics: `degree` bands,
    l = 0..degree-1; the standard Instant-NGP view-direction encoding).

    Polynomial closed forms in the unit direction components — pure
    elementwise VPU work that XLA fuses into the consumer matmul, so no
    kernel is warranted (same reasoning as frequency_encoding above).
    Directions are normalized internally; callers may pass any nonzero
    vector.  Replaces the role of tcnn's SphericalHarmonics encoding
    (admitted by the reference's tcnn schema, main.cu:35-69, though its
    committed config uses Frequency for the view dims)."""
    if not 1 <= degree <= 4:
        raise ValueError(f"sh degree must be in 1..4, got {degree}")
    d = dirs * jax.lax.rsqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree > 1:  # l=1
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree > 2:  # l=2
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree > 3:  # l=3 (forms use x^2 + y^2 = 1 - z^2: unit input)
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.37317633259011546 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)


def sh_encoding_dim(degree: int) -> int:
    return degree * degree
