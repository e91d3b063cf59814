"""Pallas transmittance-scan compositor with analytic custom VJP.

The standalone-kernel counterpart of tnerf.render.composite — and the
TPU-native answer to the reference's hand-written forward+backward
compositing kernels (vol_render/vol_render.cu:19-143, whose hand-derived
backward is inconsistent with its own forward, defects D3-D7).  Unlike
the reference, the backward here is the EXACT vector-Jacobian product of
the forward quadrature (verified against jax.grad of the jnp compositor
in tests), derived once:

    tau_s   = sigma_s * delta_s * mask_s
    T_s     = exp(-sum_{j<s} tau_j)          (exclusive)
    w_s     = T_s (1 - e^{-tau_s})
    rgb     = sum_s w_s c_s ; acc = sum_s w_s ; depth = sum_s w_s t_s

    dL/dc_s   = w_s g_rgb
    G_s       = <g_rgb, c_s> + g_acc + g_depth t_s          (= dL/dw_s)
    dL/dtau_s = T_s e^{-tau_s} G_s - sum_{j>s} w_j G_j      (suffix sum)
    dL/dsigma = dL/dtau * delta * mask ; dL/ddelta = dL/dtau * sigma * mask

Layout: rays on sublanes, samples on lanes ([B, S]); the exclusive prefix
and the suffix sum are strict-triangular [S, S] matmuls (MXU, HIGHEST
precision — exact).  Both directions are single Pallas kernels; tile =
one ray block x the full sample axis (S must be 128-divisible; rays
tiled by B_TILE).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BT = 256  # ray rows per kernel program


def _tri(S: int, strict_lower: bool) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (r > c if strict_lower else r < c).astype(jnp.float32)


def _dotT(a, tri):
    return jax.lax.dot_general(
        a, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(sig_ref, dlt_ref, msk_ref, t_ref, r_ref, g_ref, b_ref, out_ref, w_ref):
    S = sig_ref.shape[1]
    tau = sig_ref[:] * dlt_ref[:] * msk_ref[:]
    excl = _dotT(tau, _tri(S, strict_lower=False))  # sum_{j<s}
    T = jnp.exp(-excl)
    w = T * (1.0 - jnp.exp(-tau))
    w_ref[:] = w
    ls = lambda x: jnp.sum(x, axis=1, keepdims=True)
    out_ref[:, 0:1] = ls(w * r_ref[:])
    out_ref[:, 1:2] = ls(w * g_ref[:])
    out_ref[:, 2:3] = ls(w * b_ref[:])
    out_ref[:, 3:4] = ls(w)
    out_ref[:, 4:5] = ls(w * t_ref[:])
    out_ref[:, 5:6] = jnp.exp(-ls(tau))  # final transmittance


def _bwd_kernel(
    sig_ref, dlt_ref, msk_ref, t_ref, r_ref, g_ref, b_ref, gout_ref,
    dsig_ref, ddlt_ref, dr_ref, dg_ref, db_ref, dt_ref,
):
    S = sig_ref.shape[1]
    tau = sig_ref[:] * dlt_ref[:] * msk_ref[:]
    excl = _dotT(tau, _tri(S, strict_lower=False))
    T = jnp.exp(-excl)
    e = jnp.exp(-tau)
    w = T * (1.0 - e)
    g_r = gout_ref[:, 0:1]
    g_g = gout_ref[:, 1:2]
    g_b = gout_ref[:, 2:3]
    g_acc = gout_ref[:, 3:4]
    g_dep = gout_ref[:, 4:5]
    g_T = gout_ref[:, 5:6]
    dr_ref[:] = w * g_r
    dg_ref[:] = w * g_g
    db_ref[:] = w * g_b
    G = r_ref[:] * g_r + g_ref[:] * g_g + b_ref[:] * g_b + g_acc + t_ref[:] * g_dep
    wG = w * G
    suffix = _dotT(wG, _tri(S, strict_lower=True))  # sum_{j>s} w_j G_j
    T_final = jnp.exp(-jnp.sum(tau, axis=1, keepdims=True))
    dtau = T * e * G - suffix - g_T * T_final
    dsig_ref[:] = dtau * dlt_ref[:] * msk_ref[:]
    ddlt_ref[:] = dtau * sig_ref[:] * msk_ref[:]
    dt_ref[:] = w * g_dep


def _pad(a, pad_rows):
    return jnp.pad(a, ((0, pad_rows), (0, 0)))


def _call_fwd(sigma, deltas, mask, t_mid, rgb, interpret):
    B, S = sigma.shape
    pad = (-B) % _BT
    args = [
        _pad(x, pad)
        for x in (sigma, deltas, mask, t_mid, rgb[..., 0], rgb[..., 1], rgb[..., 2])
    ]
    Bp = B + pad
    grid = (Bp // _BT,)
    specs = [pl.BlockSpec((_BT, S), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 7
    out, w = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((_BT, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 8), jnp.float32),
            jax.ShapeDtypeStruct((Bp, S), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return out[:B], w[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def pallas_composite(sigma, deltas, mask, t_mid, rgb, interpret=False):
    """Composite rays in one Pallas kernel.

    sigma, deltas, mask(f32 0/1), t_mid: [B, S]; rgb: [B, S, 3].
    Returns [B, 8]: (r, g, b, acc, depth, T_final, 0, 0).
    S must be a multiple of 128 (lane dimension).
    """
    out, _ = _call_fwd(sigma, deltas, mask, t_mid, rgb, interpret)
    return out


def _vjp_fwd(sigma, deltas, mask, t_mid, rgb, interpret):
    out, _ = _call_fwd(sigma, deltas, mask, t_mid, rgb, interpret)
    return out, (sigma, deltas, mask, t_mid, rgb)


def _vjp_bwd(interpret, res, g_out):
    sigma, deltas, mask, t_mid, rgb = res
    B, S = sigma.shape
    pad = (-B) % _BT
    args = [
        _pad(x, pad)
        for x in (
            sigma, deltas, mask, t_mid,
            rgb[..., 0], rgb[..., 1], rgb[..., 2], g_out,
        )
    ]
    Bp = B + pad
    grid = (Bp // _BT,)
    in_specs = [pl.BlockSpec((_BT, S), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 7 + [
        pl.BlockSpec((_BT, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((_BT, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(6)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Bp, S), jnp.float32) for _ in range(6)
        ),
        interpret=interpret,
    )(*args)
    dsig, ddlt, dr, dg, db, dt = (o[:B] for o in outs)
    drgb = jnp.stack([dr, dg, db], axis=-1)
    return (dsig, ddlt, jnp.zeros_like(res[2]), dt, drgb)


pallas_composite.defvjp(_vjp_fwd, _vjp_bwd)
