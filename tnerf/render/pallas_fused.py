"""Fully-fused Pallas render kernel: march + encode + MLP + composite.

This is the TPU answer to the reference's entire per-batch device
pipeline (optixLaunch -> launchSampler -> tcnn forward -> volrender,
main.cu:506-746) *and* to tcnn's "fully fused MLP": one kernel walks each
ray, frequency-encodes samples, runs the radiance MLP on the MXU from
VMEM-resident weights, and composites — with NO intermediate HBM traffic
(the unfused XLA path writes ~67 floats/sample of encodings+radiance to
HBM; this kernel writes 8 floats/ray) and with chunk-level EARLY RAY
TERMINATION: once every ray in a block is opaque, remaining sample chunks
skip the MLP entirely (`@pl.when`), a data-dependent saving XLA cannot
express.

Layout design (every constraint probed on real v5e hardware):
- Rows are RAY-MAJOR: row r of a chunk is (ray b = r // SC, sample
  s = r % SC).  Per-ray data expands to rows with
  broadcast_to(block[:, None, :], (B, SC, 16)).reshape(R, 16) — a
  leading-dim collapse Mosaic supports (per-element gather/repeat and
  lane->sublane reshapes do not exist).
- MLP IO is [R, 128] (R = B_TILE*SC rows, features on lanes); per-sample
  outputs move to the compositing layout [B_TILE, SC] (rays on sublanes,
  samples on lanes) via the one supported reshape direction
  ([R, 1] -> [B_TILE, SC]).
- Exclusive per-ray transmittance cumsum = strict-upper-triangular
  [SC, SC] matmul from the right (MXU, HIGHEST precision — exact).
- Per-ray reductions are lane sums with keepdims ([B_TILE, SC] ->
  [B_TILE, 1]) — natively supported.  (Sublane reductions and M=1
  matmuls are NOT: keepdims row-sums fail to lower, and [1,K]@[K,N]
  dots compile to wrong values, with HIGHEST precision hanging the
  Mosaic compiler outright.)
- Running transmittance lives in VMEM scratch and chains across sample
  chunks (the grid iterates chunks innermost); outputs accumulate into a
  revisited [B_TILE, 8] block per ray block.

The kernel is inference-path (render/eval/bench); training uses the
autodiff XLA path (a custom-VJP backward kernel is future work).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _pack_params(
    params: dict, cfg: FieldConfig, n_feat: int,
    s_aff: np.ndarray, b_aff: np.ndarray,
):
    """Stack MLP weights into [NL, 128, 128] bf16 + [NL, 128] f32 biases,
    zero-padded, with layer-0 rows permuted to the kernel's feature order
    (see _feature_permutation) AND the input-normalization affine folded
    into the 5 identity-feature rows: the kernel feeds RAW [x,y,z,th,ph],
    so W0'[i] = s_i * W0[i] and b0' = b0 + sum_i b_i W0[i] for i < 5.
    The last layer's 4 used output lanes are (r, g, b, sigma_raw)."""
    ws, bs = params["trunk"]["w"], params["trunk"]["b"]
    nl = len(ws)
    perm = _feature_permutation(cfg)
    W_layers, B_layers = [], []
    for l, (w, b) in enumerate(zip(ws, bs)):
        w = jnp.asarray(w)  # checkpoints restore as numpy; .at needs jnp
        b = jnp.asarray(b)
        wi, wo = w.shape
        if wi > LANES or wo > LANES:
            raise ValueError(
                f"fused kernel supports layer dims <= {LANES}; got {w.shape}"
            )
        if l == 0:
            if wi != len(perm):
                raise ValueError(
                    f"layer-0 in_dim {wi} != encoded width {len(perm)}"
                )
            w = w[jnp.asarray(perm)]
            ident = w[0:5]  # rows consuming the raw p5 identity features
            b = b + jnp.asarray(b_aff) @ ident
            w = w.at[0:5].set(jnp.asarray(s_aff)[:, None] * ident)
        W_layers.append(
            jnp.zeros((LANES, LANES), jnp.float32).at[: w.shape[0], :wo].set(w)
        )
        B_layers.append(jnp.zeros((LANES,), jnp.float32).at[:wo].set(b))
    W = jnp.stack(W_layers).astype(jnp.bfloat16)
    B = jnp.stack(B_layers)
    return W, B


def _fused_kernel(
    rays_ref,    # [B_TILE, RAY_COLS] f32
    mask_ref,    # [SC, B_TILE] f32 (0/1) — sample-major so the lane dim
                 # is 128 (block lane dims must be 128-divisible);
                 # transposed to ray-major in-kernel (cheap xpose op)
    A_ref,       # [8, 123] f32
    C_ref,       # [8, 123] f32
    W_ref,       # [NL, 128, 128] bf16
    Bias_ref,    # [NL, 128] f32
    out_ref,     # [B_TILE, 8] f32: cols r,g,b,acc,depth,T_final
    T_run,       # scratch [B_TILE, 8] f32 (col 0: running transmittance)
    *,
    b_tile: int,
    sc: int,
    n_layers: int,
    term_eps: float,
    hidden_bf16: bool,
):
    chunk = pl.program_id(1)
    R = b_tile * sc

    @pl.when(chunk == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:, 5:6] = jnp.ones_like(out_ref[:, 5:6])  # T_final if all skipped
        T_run[:] = jnp.ones_like(T_run)

    # Skip the chunk when every ray is terminated (transmittance below
    # eps) OR the whole [rays x samples] tile is masked empty space —
    # the two data-dependent savings XLA's fixed pipeline cannot express.
    alive = (jnp.max(T_run[:, 0:1]) > term_eps) & (jnp.max(mask_ref[:]) > 0.0)

    @pl.when(alive)
    def _work():
        block = rays_ref[:]  # [B_TILE, 16]
        # ray-major per-row expansion: row r -> ray r // sc
        rep = jnp.broadcast_to(
            block[:, None, :], (b_tile, sc, RAY_COLS)
        ).reshape(R, RAY_COLS)
        # NOTE on VPU economics: a [R, 1] op occupies whole (8,128) tiles,
        # costing the same as a full [R, 128] op — so the prologue batches
        # coordinate math into [R, 3] ops and the hidden layers stay bf16
        # end-to-end (halves elementwise traffic vs f32).
        s_in_chunk = (
            jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % sc
        ).astype(jnp.float32)
        s_idx = s_in_chunk + chunk * sc
        t = rep[:, 6:7] + (s_idx + 0.5) * rep[:, 7:8]  # [R, 1]
        # RAW coordinates: the normalization affine is folded into A/C
        # and the layer-0 identity rows at pack time (zero runtime ops).
        # Per-axis [R,1] computes — the batched [R,3] form
        # `rep[:,0:3] + t*rep[:,3:6]` (misaligned lane slices) hangs the
        # Mosaic compiler on this stack.
        p5 = jnp.concatenate(
            [
                rep[:, 0:1] + t * rep[:, 3:4],
                rep[:, 1:2] + t * rep[:, 4:5],
                rep[:, 2:3] + t * rep[:, 5:6],
                rep[:, 8:10],
            ],
            axis=1,
        )
        sin_feat = jnp.sin(
            jnp.dot(p5, A_ref[0:5, :], preferred_element_type=jnp.float32)
            + C_ref[0:1, :]
        )  # [R, 123]
        h = jnp.concatenate([p5, sin_feat], axis=1).astype(jnp.bfloat16)
        if hidden_bf16:
            for l in range(n_layers - 1):
                h = jnp.maximum(
                    jnp.dot(h, W_ref[l], preferred_element_type=jnp.bfloat16)
                    + Bias_ref[l : l + 1, :].astype(jnp.bfloat16),
                    0.0,
                )
        else:
            for l in range(n_layers - 1):
                h = jnp.maximum(
                    jnp.dot(h, W_ref[l], preferred_element_type=jnp.float32)
                    + Bias_ref[l : l + 1, :],
                    0.0,
                ).astype(jnp.bfloat16)
        h = (
            jnp.dot(h, W_ref[n_layers - 1], preferred_element_type=jnp.float32)
            + Bias_ref[n_layers - 1 : n_layers, :]
        )
        # heads: one [R,3] sigmoid + one [R,1] softplus
        rgb3 = jax.nn.sigmoid(h[:, 0:3])
        rgb_r, rgb_g, rgb_b = rgb3[:, 0:1], rgb3[:, 1:2], rgb3[:, 2:3]
        sigma = jax.nn.softplus(h[:, 3:4] - 1.0)

        # -> compositing layout [B_TILE, SC] (ray-major row fill)
        to2d = lambda col: col.reshape(b_tile, sc)
        sig2 = to2d(sigma)
        dt2 = to2d(rep[:, 7:8])
        t2 = to2d(t)
        tau = sig2 * dt2 * mask_ref[:].T
        # exclusive lane cumsum: excl[b, s] = sum_{j < s} tau[b, j]
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (sc, sc), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (sc, sc), 1)
        ).astype(jnp.float32)
        excl = jax.lax.dot_general(
            tau, tri, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        T0 = T_run[:, 0:1]  # [B, 1]
        w = T0 * jnp.exp(-excl) * (1.0 - jnp.exp(-tau))  # [B, SC]

        lanesum = lambda x: jnp.sum(x, axis=1, keepdims=True)  # [B, 1]
        out_ref[:, 0:1] += lanesum(w * to2d(rgb_r))
        out_ref[:, 1:2] += lanesum(w * to2d(rgb_g))
        out_ref[:, 2:3] += lanesum(w * to2d(rgb_b))
        out_ref[:, 3:4] += lanesum(w)
        out_ref[:, 4:5] += lanesum(w * t2)
        T_new = T0 * jnp.exp(-lanesum(tau))
        T_run[:, 0:1] = T_new
        out_ref[:, 5:6] = T_new


def make_fused_renderer(
    field_cfg: FieldConfig,
    grid_cfg: GridConfig,
    b_tile: int = 128,
    sc: int = 32,
    term_eps: float = 1e-4,
    hidden_bf16: bool = False,
    interpret: bool = False,
):
    """Build fused_render(params, rays_packed, mask) -> [B, 8] outputs.

    rays_packed: [B, 16] f32 (see pack_rays); B % b_tile == 0.
    mask: [B, S] f32 0/1 sample validity (occupancy x in-span), S % sc == 0.
    Returns [B, 8]: cols (r, g, b, acc, depth, T_final, 0, 0).
    """
    s_aff, b_aff = _norm_affine(grid_cfg)
    A, C, n_feat = _encoding_matrices(field_cfg, s_aff, b_aff)
    A_j = jnp.asarray(A)
    C_j = jnp.asarray(C)

    def fused_render(params: dict, rays_packed: jnp.ndarray, mask: jnp.ndarray):
        B = rays_packed.shape[0]
        S = mask.shape[1]
        if B % b_tile or S % sc:
            raise ValueError(f"B={B} must divide {b_tile}, S={S} must divide {sc}")
        W, Bias = _pack_params(params, field_cfg, n_feat, s_aff, b_aff)
        nl = W.shape[0]
        kernel = functools.partial(
            _fused_kernel,
            b_tile=b_tile, sc=sc, n_layers=nl, term_eps=term_eps,
            hidden_bf16=hidden_bf16,
        )
        grid = (B // b_tile, S // sc)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_tile, RAY_COLS), lambda rb, sc_: (rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sc, b_tile), lambda rb, sc_: (sc_, rb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES - 5), lambda rb, sc_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES - 5), lambda rb, sc_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nl, LANES, LANES), lambda rb, sc_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nl, LANES), lambda rb, sc_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b_tile, 8), lambda rb, sc_: (rb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
            scratch_shapes=[pltpu.VMEM((b_tile, 8), jnp.float32)],
            interpret=interpret,
        )(rays_packed, mask.T, A_j, C_j, W, Bias)
        return out

    return fused_render


def pack_rays(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    viewdirs_tp: jnp.ndarray,
    t_enter: jnp.ndarray,
    dt: jnp.ndarray,
) -> jnp.ndarray:
    """[B, 16] fused-kernel ray layout."""
    B = origins.shape[0]
    return jnp.concatenate(
        [
            origins,
            directions,
            t_enter[:, None],
            dt[:, None],
            viewdirs_tp,
            jnp.zeros((B, RAY_COLS - 10), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)


def make_fused_pipeline_renderer(
    field_cfg: FieldConfig,
    grid_cfg: GridConfig,
    sampler_cfg,
    render_cfg,
    b_tile: int = 128,
    sc: int = 32,
    interpret: bool = False,
):
    """Adapt the fused kernel to the standard renderer protocol
    render(params, rays, key=None, occupancy=None) -> RenderResult.

    Inference-path only (rendering/eval/bench): the kernel has no custom
    VJP yet, so training through it raises at trace time via jax.grad.
    Occupancy masks are computed in XLA (one gather) and fed to the
    kernel as the [S, B] validity plane.
    """
    from tnerf.cameras import Rays  # local import to avoid cycles
    from tnerf.grid.traversal import occupancy_lookup, ray_aabb
    from tnerf.render.composite import RenderResult
    from tnerf.sampling import sample_positions

    fused = make_fused_renderer(field_cfg, grid_cfg, b_tile=b_tile, sc=sc,
                                term_eps=render_cfg.transmittance_threshold,
                                interpret=interpret)
    S = sampler_cfg.samples_per_ray
    if S % sc:
        raise ValueError(f"samples_per_ray={S} must be a multiple of sc={sc}")

    def render(params, rays: Rays, key=None, occupancy=None) -> RenderResult:
        B = rays.origins.shape[0]
        pad = (-B) % b_tile
        o = jnp.pad(rays.origins, ((0, pad), (0, 0)))
        d = jnp.pad(rays.directions, ((0, pad), (0, 0)), constant_values=1.0)
        tp = jnp.pad(rays.viewdirs_tp, ((0, pad), (0, 0)))
        te, tx = ray_aabb(o, d, grid_cfg.aabb_min, grid_cfg.aabb_max)
        te = jnp.maximum(te, sampler_cfg.near)
        tx = jnp.maximum(tx, te)
        dt = (tx - te) / S
        mask = (tx > te)[:, None] & jnp.ones((o.shape[0], S), bool)
        if occupancy is not None:
            r = grid_cfg.resolution
            s_idx = jnp.arange(S, dtype=jnp.float32) + 0.5
            t = te[:, None] + s_idx * dt[:, None]
            pts = sample_positions(o, d, t)
            mask = mask & occupancy_lookup(pts, occupancy.reshape(r, r, r), grid_cfg)
        out = fused(params, pack_rays(o, d, tp, te, dt),
                    mask.astype(jnp.float32))
        rgb = out[:B, 0:3]
        acc = out[:B, 3]
        depth = out[:B, 4]
        if render_cfg.white_background:
            rgb = rgb + (1.0 - acc)[:, None]
        empty = jnp.zeros((B, 0), jnp.float32)
        return RenderResult(rgb=rgb, acc=acc, depth=depth,
                            weights=empty, transmittance=empty)

    return render


def fused_reference(
    params: dict,
    rays_packed: jnp.ndarray,
    mask: jnp.ndarray,
    field_cfg: FieldConfig,
    grid_cfg: GridConfig,
) -> jnp.ndarray:
    """Parity target for the kernel: the PRODUCTION field + compositor
    (NeRFField.apply + composite), on the kernel's packed inputs.
    No early termination. mask: [B, S]. Returns [B, 8] like the kernel."""
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.composite import composite

    field = NeRFField(field_cfg, grid_cfg)
    B, S = mask.shape
    o = rays_packed[:, 0:3]
    d = rays_packed[:, 3:6]
    t_enter = rays_packed[:, 6]
    dt = rays_packed[:, 7]
    tp = rays_packed[:, 8:10]
    s = jnp.arange(S, dtype=jnp.float32)
    t = t_enter[:, None] + (s + 0.5) * dt[:, None]  # [B, S]
    pts = o[:, None, :] + d[:, None, :] * t[..., None]
    rgb, sigma = field.apply(params, pts, tp[:, None, :])
    deltas = jnp.broadcast_to(dt[:, None], (B, S))
    maskb = mask.astype(bool)
    res = composite(rgb, sigma, deltas, t_mid=t, mask=maskb)
    T_final = jnp.exp(-jnp.sum(sigma * deltas * mask, axis=-1))
    return jnp.stack(
        [
            res.rgb[:, 0], res.rgb[:, 1], res.rgb[:, 2],
            res.acc, res.depth, T_final,
            jnp.zeros((B,)), jnp.zeros((B,)),
        ],
        axis=1,
    )
