"""Emission-absorption volume rendering quadrature.

TPU-native replacement for reference vol_render/vol_render.cu.  The
reference's forward pass accumulates optical depth *including* the current
sample before exponentiating (vol_render.cu:60-63, defect D3), resets `t`
per segment (D5), and its hand-derived backward is inconsistent with its
own forward (D4/D6/D7).  This module implements the *intended* standard
NeRF quadrature:

    alpha_i = 1 - exp(-sigma_i * delta_i)
    T_i     = exp(-sum_{j<i} sigma_j delta_j)     (exclusive!)
    w_i     = T_i * alpha_i
    rgb     = sum_i w_i c_i  (+ background * (1 - sum_i w_i))

The backward pass is exact by construction: the forward is expressed as
cumsum + elementwise ops, so `jax.grad` produces the true VJP (the TPU
answer to vol_render.cu:75-143's hand-derived kernel).  XLA fuses the
whole thing into a handful of VPU loops.  (A Pallas blockwise-scan
compositor existed through round 2; measured at its S=768 design case
inside grid_intervals it was 2% SLOWER than this XLA path — the pipeline
is field-bound — and was deleted.  See docs/KERNEL_NOTES.md round-3
addendum.)

Everything is shape-polymorphic over leading batch dims with a static
sample axis S — rays are rows of a [batch, S] matrix, never ragged
(SURVEY §7.1 core data-model decision).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class RenderResult(NamedTuple):
    """Renderer output contract.

    `weights`/`transmittance` carry PER-SAMPLE arrays ([..., S]) from the
    XLA compositors; the FUSED Pallas pipeline composites on-chip and
    never materializes per-sample arrays to HBM (that traffic is the
    point of fusing), so it returns S=0-width arrays there.  Consumers
    needing per-sample weights (e.g. importance resampling) must check
    `weights.shape[-1] > 0` or use an unfused pipeline.
    """

    rgb: jnp.ndarray          # [..., 3] composited color
    acc: jnp.ndarray          # [...] accumulated opacity (sum of weights)
    depth: jnp.ndarray        # [...] expected termination t
    weights: jnp.ndarray      # [..., S] per-sample weights (S=0 from fused)
    transmittance: jnp.ndarray  # [..., S] exclusive T_i (S=0 from fused)
    distortion: jnp.ndarray   # [...] per-ray mip-NeRF-360 distortion term
    #                           (0 from the fused / packed-compaction
    #                            paths, which never materialize weights —
    #                            train.distortion_weight validates against
    #                            those configurations)


def render_weights(
    sigma: jnp.ndarray,
    deltas: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample compositing weights w_i = T_i * (1 - exp(-sigma_i d_i)).

    sigma:  [..., S] non-negative densities
    deltas: [..., S] segment lengths along the ray (monotone global t —
            fixing defect D5's per-segment reset)
    mask:   optional [..., S] bool; masked-out samples contribute nothing
            (the static-shape padding story, SURVEY §7.3 item 1)
    Returns (weights [..., S], transmittance [..., S]) in float32.
    """
    sigma = sigma.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    tau = sigma * deltas  # optical depth per segment
    if mask is not None:
        tau = jnp.where(mask, tau, 0.0)
    # Exclusive prefix sum: T_i depends on j < i only (fixes D3).
    tau_cum = jnp.cumsum(tau, axis=-1) - tau
    transmittance = jnp.exp(-tau_cum)
    alpha = 1.0 - jnp.exp(-tau)
    weights = transmittance * alpha
    return weights, transmittance


def distortion_term(
    weights: jnp.ndarray, t_mid: jnp.ndarray, deltas: jnp.ndarray
) -> jnp.ndarray:
    """Per-ray mip-NeRF 360 distortion (eq. 15): the self-interaction of
    the ray's weight distribution,

        L = sum_ij w_i w_j |t_i - t_j|  +  (1/3) sum_i w_i^2 delta_i.

    Minimized when weight mass collapses to a single compact interval —
    the floater/background-collapse regularizer for real captures.
    Computed in O(S) with the standard cumsum identity (t must be
    ascending along the sample axis, which every sampler in this
    framework emits); masked/padded samples carry w = 0 and drop out of
    both terms.  Distances are in raw ray-t units — the caller
    normalizes by the span (train_loop divides the weight by far-near),
    keeping the knob scale-free like the s-space formulation."""
    w = weights.astype(jnp.float32)
    s = t_mid.astype(jnp.float32)
    wc = jnp.cumsum(w, axis=-1) - w
    wsc = jnp.cumsum(w * s, axis=-1) - w * s
    inter = 2.0 * jnp.sum(w * (s * wc - wsc), axis=-1)
    intra = jnp.sum(w * w * deltas.astype(jnp.float32), axis=-1) / 3.0
    return inter + intra


def composite(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    deltas: jnp.ndarray,
    t_mid: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    white_background: bool = False,
) -> RenderResult:
    """Full composite: per-sample radiance -> per-ray pixel.

    rgb:    [..., S, 3] sample colors in [0, 1]
    sigma:  [..., S]
    deltas: [..., S]
    t_mid:  optional [..., S] sample depths for the expected-depth output
    background: optional [..., 3] or [3]; overrides white_background
    """
    weights, transmittance = render_weights(sigma, deltas, mask)
    rgb = rgb.astype(jnp.float32)
    out_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    if t_mid is None:
        depth = jnp.zeros_like(acc)
        distortion = jnp.zeros_like(acc)
    else:
        depth = jnp.sum(weights * t_mid.astype(jnp.float32), axis=-1)
        distortion = distortion_term(weights, t_mid, deltas)
    if background is None and white_background:
        background = jnp.ones((3,), dtype=jnp.float32)
    if background is not None:
        out_rgb = out_rgb + (1.0 - acc)[..., None] * background
    return RenderResult(out_rgb, acc, depth, weights, transmittance, distortion)
