"""Triplane / vector-matrix (VM) factorized field encoding (TensoRF-style).

A third field family beyond the reference's frequency MLP and the
Instant-NGP hash grid (the reference's tcnn schema, main.cu:35-69, is
the extension point this slots into): the scene volume is represented
by three orthogonal feature PLANES plus three matching feature LINES,

    feat_p(x) = bilinear(plane_p, proj_p(x)) * linear(line_p, axis_p(x))

for the pairs (XY, Z), (XZ, Y), (YZ, X), concatenated into a
[..., 3*F] feature that feeds a shallow MLP — the VM decomposition of
TensoRF (Chen et al., ECCV 2022).  Versus the hash grid: no hash
collisions, O(3*R^2*F) parameters instead of O(L*T*F), and 18 table
rows touched per sample instead of L*8.

TPU formulation mirrors tnerf/fields/hashgrid.py:
- "gather": XLA gathers on flat [3*R*R, F] / [3*R, F] tables;
  gradients by autodiff (deterministic scatter-add).
- "onehot": the shared MXU one-hot primitives (tnerf/fields/onehot.py)
  with a hand-written chunk-scanned VJP that saves only the positions
  (no stacked residuals; the backward recomputes the cheap geometry and
  the partner factor of the VM product).  Planes flatten to R*R-row
  tables padded to a 128 multiple; auto mode requires R*R <= 2^15 (the
  same <=256-row bound measured as the matmul-gather win region for the
  hash grid, docs/KERNEL_NOTES.md).

The 'onehot' path treats positions as non-differentiable (zero
cotangent, like the hash grid's one-hot path); use
tri_gather_mode='gather' if dL/dx is ever needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tnerf.config import FieldConfig
from tnerf.fields.hashgrid import _chunk_iter, _onehot_dtypes
from tnerf.fields.onehot import (
    onehot_lookup,
    onehot_outer,
    pack_tables,
    unpack_tables,
)

# Plane p reads position components _PLANE_AXES[p]; its matching line
# reads _LINE_AXIS[p] (TensoRF's (XY,Z), (XZ,Y), (YZ,X) pairing).
_PLANE_AXES = ((0, 1), (0, 2), (1, 2))
_LINE_AXIS = (2, 1, 0)


def init_triplane(key: jax.Array, cfg: FieldConfig) -> dict:
    """planes [3, R*R, F], lines [3, R, F] — 0.1 * N(0,1) init (TensoRF's
    initialization scale; the VM product starts at ~1e-2 magnitude like
    the hash grid's 1e-4 uniform but with sign diversity on both
    factors)."""
    R, F = cfg.tri_resolution, cfg.tri_features
    kp, kl = jax.random.split(key)
    return {
        "planes": 0.1 * jax.random.normal(kp, (3, R * R, F), jnp.float32),
        "lines": 0.1 * jax.random.normal(kl, (3, R, F), jnp.float32),
    }


def triplane_num_params(cfg: FieldConfig) -> int:
    R, F = cfg.tri_resolution, cfg.tri_features
    return 3 * R * R * F + 3 * R * F


def _resize_vertex_axis(a: jnp.ndarray, axis: int, r_new: int) -> jnp.ndarray:
    """Align-corners linear resize along a VERTEX axis (the R vertices
    span [0, 1] with R-1 cells — _tri_geometry's convention), so the
    resized table samples the old interpolant exactly at the new vertex
    positions.  jax.image.resize is half-pixel-centered and would shift
    every vertex; hence the explicit gather+lerp."""
    r_old = a.shape[axis]
    pos = jnp.linspace(0.0, r_old - 1.0, r_new)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(r_old - 2, 0))
    f = (pos - i0.astype(jnp.float32)).astype(a.dtype)
    a0 = jnp.take(a, i0, axis=axis)
    a1 = jnp.take(a, jnp.minimum(i0 + 1, r_old - 1), axis=axis)
    shape = [1] * a.ndim
    shape[axis] = r_new
    f = f.reshape(shape)
    return a0 * (1.0 - f) + a1 * f


def upsample_triplane(params: dict, r_new: int) -> dict:
    """TensoRF's progressive-upsampling step: resample planes/lines to a
    finer vertex grid (align-corners bilinear/linear), preserving the
    represented field at the new vertices.  The TensoRF recipe grows the
    grid at fixed step milestones during training (the stage driver in
    tnerf/train_loop.py); the optimizer state is re-initialized at each
    growth like TensoRF's lr_upsample_reset."""
    planes, lines = params["planes"], params["lines"]
    r_old = lines.shape[1]
    f = planes.shape[-1]
    p = planes.reshape(3, r_old, r_old, f)
    p = _resize_vertex_axis(p, 1, r_new)
    p = _resize_vertex_axis(p, 2, r_new)
    return {
        "planes": p.reshape(3, r_new * r_new, f),
        "lines": _resize_vertex_axis(lines, 1, r_new),
    }


def triplane_tv(params: dict) -> jnp.ndarray:
    """TensoRF's total-variation regularizer on the VM factors: mean
    squared difference between ADJACENT vertices of each plane (both
    in-plane axes) and each line.  Smooths the factor grids where the
    photometric loss is unconstrained — the complement of the L1 prior
    (train.table_l1_weight pulls unobserved entries to zero; TV pulls
    neighboring entries together, suppressing high-frequency fit noise
    that shows up as surface shimmer)."""
    planes, lines = params["planes"], params["lines"]
    r = lines.shape[1]
    f = planes.shape[-1]
    p = planes.reshape(3, r, r, f)
    return (
        jnp.square(jnp.diff(p, axis=1)).mean()
        + jnp.square(jnp.diff(p, axis=2)).mean()
        + jnp.square(jnp.diff(lines, axis=1)).mean()
    )


def _tri_geometry(x01: jnp.ndarray, R: int):
    """Vertex-grid geometry shared by both modes: x01 [..., 3] in [0,1]^3
    -> (ip0 [..., 3, 2] int32 plane base corner, fp [..., 3, 2] f32,
    il0 [..., 3] int32 line base vertex, fl [..., 3] f32).  The R vertices
    span [0, 1] with R-1 cells (same convention on planes and lines)."""
    pos = jnp.clip(x01 * (R - 1), 0.0, (R - 1) - 1e-4)
    i0 = jnp.floor(pos)
    frac = (pos - i0).astype(jnp.float32)
    i0 = i0.astype(jnp.int32)
    pa = jnp.asarray(_PLANE_AXES)  # [3, 2]
    la = jnp.asarray(_LINE_AXIS)  # [3]
    ip0 = i0[..., pa]  # [..., 3, 2]
    fp = frac[..., pa]
    il0 = i0[..., la]  # [..., 3]
    fl = frac[..., la]
    return ip0, fp, il0, fl


def _plane_corner(c: int, ip0, fp, R: int):
    """Bilinear corner c (0..3): flat plane index [..., 3] int32 in
    [0, R*R) and weight [..., 3] f32."""
    du, dv = (c >> 1) & 1, c & 1
    u = ip0[..., 0] + du
    v = ip0[..., 1] + dv
    idx = u * R + v
    w = (fp[..., 0] if du else 1.0 - fp[..., 0]) * (
        fp[..., 1] if dv else 1.0 - fp[..., 1]
    )
    return idx, w


def resolve_tri_mode(cfg: FieldConfig) -> str:
    """'onehot' (MXU matmul-gather) or 'gather' (XLA gather); 'auto'
    picks onehot on TPU when the flattened plane stays within the
    measured matmul-gather win region (R*R <= 2^15 -> <= 256 rows)."""
    mode = cfg.tri_gather_mode
    if mode != "auto":
        return mode
    if jax.default_backend() == "tpu":
        if cfg.tri_resolution ** 2 <= (1 << 15):
            return "onehot"
        import logging

        logging.getLogger("tnerf").warning(
            "tri_gather_mode=auto: plane size R^2=%d exceeds the MXU "
            "one-hot path's limit (2^15); falling back to the XLA gather "
            "path (~8 ns/element on TPU) — set tri_resolution<=181 for "
            "the fast path.",
            cfg.tri_resolution ** 2,
        )
    return "gather"


def apply_triplane(
    params: dict, x01: jnp.ndarray, cfg: FieldConfig, mode: str | None = None
) -> jnp.ndarray:
    """x01 [..., 3] in [0,1]^3 -> [..., 3*F] VM features."""
    m = mode or resolve_tri_mode(cfg)
    if m == "onehot":
        return apply_triplane_onehot(params, x01, cfg)
    return apply_triplane_gather(params, x01, cfg)


def vm_product_gather(
    planes3: jnp.ndarray, lines3: jnp.ndarray, x01: jnp.ndarray, R: int
) -> jnp.ndarray:
    """The VM product in gather formulation on an arbitrary feature
    width: planes3 [3, R*R, F'], lines3 [3, R, F'] -> [..., 3, F'].
    Shared by apply_triplane_gather (F' = F) and the table-parallel
    encode (F' = F/n per shard — the VM product is elementwise in the
    feature axis, so feature-sharding needs no cross-shard arithmetic,
    tnerf/parallel/table_parallel.py).  Corner loop instead of a
    vectorized [..., 3, 4] index tensor for the same working-set reason
    as apply_hashgrid_gather."""
    f = planes3.shape[-1]
    ip0, fp, il0, fl = _tri_geometry(x01, R)
    planes = planes3.reshape(3 * R * R, f)
    lines = lines3.reshape(3 * R, f)
    off_p = jnp.arange(3, dtype=jnp.int32) * (R * R)
    off_l = jnp.arange(3, dtype=jnp.int32) * R

    B = jnp.zeros((*x01.shape[:-1], 3, f), jnp.float32)
    for c in range(4):
        idx, w = _plane_corner(c, ip0, fp, R)
        B = B + w[..., None] * planes[idx + off_p]
    Lin = jnp.zeros((*x01.shape[:-1], 3, f), jnp.float32)
    for c in range(2):
        w = fl if c else 1.0 - fl
        Lin = Lin + w[..., None] * lines[il0 + c + off_l]
    return B * Lin


def apply_triplane_gather(
    params: dict, x01: jnp.ndarray, cfg: FieldConfig
) -> jnp.ndarray:
    """XLA-gather formulation; gradients by autodiff (the gather VJP is a
    deterministic scatter-add)."""
    R, F = cfg.tri_resolution, cfg.tri_features
    out = vm_product_gather(params["planes"], params["lines"], x01, R)
    return out.reshape(*x01.shape[:-1], 3 * F)


def apply_triplane_onehot(
    params: dict, x01: jnp.ndarray, cfg: FieldConfig, chunk: int = 8192
) -> jnp.ndarray:
    """MXU matmul-gather formulation (shared primitives with the hash
    grid's fast path, tnerf/fields/onehot.py).  Chunk-scanned with a
    custom VJP that saves only positions; positions get a zero cotangent
    (see module docstring)."""
    R = cfg.tri_resolution
    if R * R > (1 << 15):
        raise ValueError(
            f"onehot triplane mode needs R*R <= 2^15, got R={R}"
        )
    F = cfg.tri_features
    batch_shape = x01.shape[:-1]
    x = x01.reshape(-1, 3)
    n = x.shape[0]
    n_pad = -(-n // chunk) * chunk if n > chunk else n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    y = _tri_onehot_encode(
        params["planes"], params["lines"], x, cfg, min(chunk, n_pad)
    )
    return y[:n].reshape(*batch_shape, 3 * F)


def _pad_rows(t: jnp.ndarray) -> jnp.ndarray:
    """Pad the entry axis of [3, M, F] to a multiple of 128 (padded
    entries are never selected: indices stay < M)."""
    m = t.shape[1]
    pad = (-m) % 128
    return jnp.pad(t, ((0, 0), (0, pad), (0, 0))) if pad else t


def _tri_factors_chunk(planes_m, lines_m, xc, cfg, cdtype):
    """One chunk's VM factors: (B [3, C, F] f32, Lin [3, C, F] f32) —
    shared by the custom-VJP forward and its recomputing backward."""
    R = cfg.tri_resolution
    F = cfg.tri_features
    c_sz = xc.shape[0]
    ip0, fp, il0, fl = _tri_geometry(xc, R)
    B = jnp.zeros((3, c_sz, F), jnp.float32)
    for c in range(4):
        idx, w = _plane_corner(c, ip0, fp, R)
        val = onehot_lookup(planes_m, idx.T, cdtype)
        B = B + w.T[:, :, None] * val.astype(jnp.float32)
    Lin = jnp.zeros((3, c_sz, F), jnp.float32)
    for c in range(2):
        w = fl if c else 1.0 - fl
        val = onehot_lookup(lines_m, (il0 + c).T, cdtype)
        Lin = Lin + w.T[:, :, None] * val.astype(jnp.float32)
    return B, Lin


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _tri_onehot_encode(planes, lines, x, cfg, chunk):
    """planes [3, R*R, F], lines [3, R, F], x [Npad, 3] (Npad % chunk
    == 0) -> [Npad, 3*F] f32."""
    F = cfg.tri_features
    cdtype = _onehot_dtypes(cfg)
    planes_m = pack_tables(_pad_rows(planes), cdtype)
    lines_m = pack_tables(_pad_rows(lines), cdtype)

    def encode_chunk(_, xc):
        B, Lin = _tri_factors_chunk(planes_m, lines_m, xc, cfg, cdtype)
        out = B * Lin  # [3, C, F]
        return None, out.transpose(1, 0, 2).reshape(xc.shape[0], 3 * F)

    _, y = _chunk_iter(x, chunk, encode_chunk, None)
    return y.reshape(x.shape[0], 3 * F)


def _tri_onehot_fwd(planes, lines, x, cfg, chunk):
    return _tri_onehot_encode(planes, lines, x, cfg, chunk), (planes, lines, x)


def _tri_onehot_bwd(cfg, chunk, res, g):
    """d(planes), d(lines) with no stacked residuals: recompute the
    chunk's geometry and the PARTNER factor of the VM product, then one
    onehot_outer matmul per corner per chunk, accumulated in f32
    (deterministic — the same no-scatter backward as the hash grid's)."""
    planes, lines, x = res
    R, F = cfg.tri_resolution, cfg.tri_features
    cdtype = _onehot_dtypes(cfg)
    planes_m = pack_tables(_pad_rows(planes), cdtype)
    lines_m = pack_tables(_pad_rows(lines), cdtype)
    rows_p = planes_m.shape[1]
    rows_l = lines_m.shape[1]

    def bwd_chunk(acc, inp):
        acc_p, acc_l = acc
        xc, gc = inp  # [C, 3], [C, 3*F]
        c_sz = xc.shape[0]
        g3 = gc.reshape(c_sz, 3, F).transpose(1, 0, 2)  # [3, C, F] f32
        B, Lin = _tri_factors_chunk(planes_m, lines_m, xc, cfg, cdtype)
        gB = g3 * Lin  # dL/dB
        gL = g3 * B  # dL/dLin
        ip0, fp, il0, fl = _tri_geometry(xc, R)
        for c in range(4):
            idx, w = _plane_corner(c, ip0, fp, R)
            acc_p = acc_p + onehot_outer(
                idx.T, w.T[:, :, None] * gB, rows_p, cdtype
            )
        for c in range(2):
            w = fl if c else 1.0 - fl
            acc_l = acc_l + onehot_outer(
                (il0 + c).T, w.T[:, :, None] * gL, rows_l, cdtype
            )
        return (acc_p, acc_l), None

    init = (
        jnp.zeros((3, rows_p, F * 128), jnp.float32),
        jnp.zeros((3, rows_l, F * 128), jnp.float32),
    )
    (dp_m, dl_m), _ = _chunk_iter((x, g), chunk, bwd_chunk, init)
    dplanes = unpack_tables(dp_m, F)[:, : R * R]
    dlines = unpack_tables(dl_m, F)[:, :R]
    # Positions: zero cotangent by design (module docstring).
    return dplanes, dlines, jnp.zeros_like(x)


_tri_onehot_encode.defvjp(_tri_onehot_fwd, _tri_onehot_bwd)


# ---- CP decomposition (TensoRF's rank-F ablation family) --------------------
#
# feat_f(x) = Lx[x, f] * Ly[y, f] * Lz[z, f]: three R-entry LINE factors
# per feature, linearly interpolated along their axis — TensoRF's CP
# variant (the paper's lighter sibling of the VM decomposition above).
# O(3*R*F) parameters; output dim F (vs the VM's 3*F).  Same dual
# formulation and the same chunk-scanned positions-only custom VJP: the
# backward recomputes the geometry and the PARTNER PRODUCT of the other
# two factors, then one onehot_outer matmul per interpolation corner per
# axis (deterministic, no scatter).


def init_cp(key: jax.Array, cfg: FieldConfig) -> dict:
    """lines [3, R, F] — 0.2 * N(0,1): the triple product starts at
    ~8e-3 magnitude (three factors vs the VM's two, hence the larger
    per-factor scale than init_triplane's 0.1)."""
    R, F = cfg.tri_resolution, cfg.tri_features
    return {"lines": 0.2 * jax.random.normal(key, (3, R, F), jnp.float32)}


def cp_num_params(cfg: FieldConfig) -> int:
    return 3 * cfg.tri_resolution * cfg.tri_features


def _cp_geometry(x01: jnp.ndarray, R: int):
    """Per-axis vertex-grid geometry (same convention as _tri_geometry):
    x01 [..., 3] -> (i0 [..., 3] int32, frac [..., 3] f32)."""
    pos = jnp.clip(x01 * (R - 1), 0.0, (R - 1) - 1e-4)
    i0 = jnp.floor(pos)
    return i0.astype(jnp.int32), (pos - i0).astype(jnp.float32)


def _cp_factors(lines3, i0, frac):
    """Interpolated per-axis factors [..., 3, F] from lines3 [3, R, F]
    (gather formulation; axis a reads x01[..., a])."""
    R = lines3.shape[1]
    F = lines3.shape[-1]
    lines = lines3.reshape(3 * R, F)
    off = jnp.arange(3, dtype=jnp.int32) * R
    out = jnp.zeros((*i0.shape[:-1], 3, F), jnp.float32)
    for c in range(2):
        w = frac if c else 1.0 - frac
        out = out + w[..., None] * lines[i0 + c + off]
    return out


def apply_cp_gather(
    params: dict, x01: jnp.ndarray, cfg: FieldConfig
) -> jnp.ndarray:
    """XLA-gather formulation; gradients by autodiff."""
    i0, frac = _cp_geometry(x01, cfg.tri_resolution)
    fac = _cp_factors(params["lines"], i0, frac)  # [..., 3, F]
    return fac[..., 0, :] * fac[..., 1, :] * fac[..., 2, :]


def resolve_cp_mode(cfg: FieldConfig) -> str:
    """'onehot' on TPU (line tables are tiny — always within the
    matmul-gather win region), 'gather' elsewhere; explicit modes pass
    through (same knob as the VM family: field_.tri_gather_mode)."""
    mode = cfg.tri_gather_mode
    if mode != "auto":
        return mode
    return "onehot" if jax.default_backend() == "tpu" else "gather"


def apply_cp(
    params: dict, x01: jnp.ndarray, cfg: FieldConfig, mode: str | None = None
) -> jnp.ndarray:
    """x01 [..., 3] in [0,1]^3 -> [..., F] CP features."""
    m = mode or resolve_cp_mode(cfg)
    if m == "onehot":
        return apply_cp_onehot(params, x01, cfg)
    return apply_cp_gather(params, x01, cfg)


def apply_cp_onehot(
    params: dict, x01: jnp.ndarray, cfg: FieldConfig, chunk: int = 8192
) -> jnp.ndarray:
    """MXU matmul-gather formulation (shared one-hot primitives); chunk-
    scanned custom VJP saving only positions — positions get a zero
    cotangent like the other one-hot paths."""
    F = cfg.tri_features
    batch_shape = x01.shape[:-1]
    x = x01.reshape(-1, 3)
    n = x.shape[0]
    n_pad = -(-n // chunk) * chunk if n > chunk else n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    y = _cp_onehot_encode(params["lines"], x, cfg, min(chunk, n_pad))
    return y[:n].reshape(*batch_shape, F)


def _cp_factors_onehot(lines_m, xc, cfg, cdtype):
    """One chunk's factors [3, C, F] via one-hot lookups (lines_m is the
    pack_tables form of the row-padded [3, R', F] lines)."""
    R = cfg.tri_resolution
    F = cfg.tri_features
    i0, frac = _cp_geometry(xc, R)
    out = jnp.zeros((3, xc.shape[0], F), jnp.float32)
    for c in range(2):
        w = frac if c else 1.0 - frac
        val = onehot_lookup(lines_m, (i0 + c).T, cdtype)
        out = out + w.T[:, :, None] * val.astype(jnp.float32)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _cp_onehot_encode(lines, x, cfg, chunk):
    """lines [3, R, F], x [Npad, 3] -> [Npad, F] f32."""
    cdtype = _onehot_dtypes(cfg)
    lines_m = pack_tables(_pad_rows(lines), cdtype)

    def encode_chunk(_, xc):
        fac = _cp_factors_onehot(lines_m, xc, cfg, cdtype)
        return None, fac[0] * fac[1] * fac[2]

    _, y = _chunk_iter(x, chunk, encode_chunk, None)
    return y.reshape(x.shape[0], cfg.tri_features)


def _cp_onehot_fwd(lines, x, cfg, chunk):
    return _cp_onehot_encode(lines, x, cfg, chunk), (lines, x)


def _cp_onehot_bwd(cfg, chunk, res, g):
    """d(lines) with no stacked residuals: recompute the chunk's
    geometry and the PARTNER PRODUCT of the other two axes' factors,
    then one onehot_outer per corner per axis, accumulated in f32."""
    lines, x = res
    R, F = cfg.tri_resolution, cfg.tri_features
    cdtype = _onehot_dtypes(cfg)
    lines_m = pack_tables(_pad_rows(lines), cdtype)
    rows = lines_m.shape[1]

    def bwd_chunk(acc, inp):
        xc, gc = inp  # [C, 3], [C, F]
        fac = _cp_factors_onehot(lines_m, xc, cfg, cdtype)  # [3, C, F]
        # dL/d(factor_a) = g * (product of the other two factors)
        others = jnp.stack([fac[1] * fac[2], fac[0] * fac[2], fac[0] * fac[1]])
        gfac = gc[None] * others
        i0, frac = _cp_geometry(xc, R)
        for c in range(2):
            w = frac if c else 1.0 - frac
            acc = acc + onehot_outer(
                (i0 + c).T, w.T[:, :, None] * gfac, rows, cdtype
            )
        return acc, None

    init = jnp.zeros((3, rows, F * 128), jnp.float32)
    dl_m, _ = _chunk_iter((x, g), chunk, bwd_chunk, init)
    dlines = unpack_tables(dl_m, F)[:, :R]
    return dlines, jnp.zeros_like(x)


_cp_onehot_encode.defvjp(_cp_onehot_fwd, _cp_onehot_bwd)
