"""Occupancy-grid renderers (BASELINE config 2).

Two strategies, both pure functions jitted end-to-end:

- "intervals" (reference parity): traverse_grid -> per-interval sampling
  (32/interval, reference sampler.h:4) -> field -> composite.  This is
  the reference's exact pipeline shape (optixLaunch -> launchSampler ->
  network->forward -> launch_volrender, main.cu:506-746) as one fused
  XLA program.
- "march" (TPU fast path): slab-range fixed-count marching with
  occupancy-bitfield masking and optional cross-batch sample compaction —
  the fusion the reference's dead "ray sample" pipeline #2 intended
  (optixPrograms.cu:250-314).  Compaction replaces tcnn's ragged batch
  with a static-capacity gather: only (approximately) the occupied
  samples pay MLP FLOPs, which is where >5x of the speed-of-light budget
  lives at typical occupancies.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tnerf.cameras import Rays
from tnerf.config import GridConfig, RenderConfig, SamplerConfig
from tnerf.fields.nerf_field import NeRFField
from tnerf.grid.pallas_dda import tighten_sample_mask_pallas
from tnerf.grid.traversal import (
    density_lookup_fast,
    make_coarse_density,
    make_coarse_occupancy,
    march_samples_t,
    occupancy_lookup,
    occupancy_lookup_fast,
    ray_aabb,
    tightened_range,
    traverse_grid,
)
from tnerf.render.composite import RenderResult, composite
from tnerf.render.fused_common import compact_rows, scatter_back
from tnerf.sampling import cdf_ray_samples, interval_samples, sample_positions


def _segmented_cumsum(x: jnp.ndarray, seg_start: jnp.ndarray) -> jnp.ndarray:
    """Inclusive per-segment prefix sum over a flat array.

    seg_start[i] marks the first element of each segment.  Exact per
    segment: the scan operator only ever adds in-segment terms, so the
    precision matches a per-ray cumsum (a GLOBAL cumsum followed by
    offset subtraction would lose ~log2(total_tau) bits to cancellation
    at render batch sizes)."""

    def op(a, b):
        sa, fa = a
        sb, fb = b
        return jnp.where(fb, sb, sa + sb), fa | fb

    s, _ = jax.lax.associative_scan(op, (x, seg_start))
    return s


def compacted_shade(
    field: NeRFField,
    params: dict,
    positions: jnp.ndarray,   # [B, S, 3]
    viewdirs: jnp.ndarray,    # [B, 2]
    t: jnp.ndarray,           # [B, S] sample depths (midpoints)
    deltas: jnp.ndarray,      # [B, S]
    mask: jnp.ndarray,        # [B, S] bool
    capacity: int,
    white_background: bool,
) -> RenderResult:
    """Field eval + compositing entirely in the compacted sample domain.

    The TPU replacement for the reference's thrust::exclusive_scan batch
    compaction (main.cu:631-637), without ragged shapes.  Design is
    driven by the measured ~8 ns/ROW cost of every XLA TPU scatter or
    gather (docs/KERNEL_NOTES.md): with N = B*S sample slots and
    K = capacity kept samples (K ~ N/4 at production masks), the frame
    must never run an [N]-row scatter/gather after the mask is known.

      - the kept-sample permutation comes from ONE stable sort of [N]
        int32 keys (XLA TPU sort: ~1.8 ns/elem, 4x cheaper than the
        row-scatter it replaces);
      - inputs move through ONE [K]-row gather of packed
        pos+view+t+delta rows;
      - compositing runs ON THE COMPACTED ORDER: kept samples of a ray
        are contiguous (cumsum write ranks are ray-major), so T_i comes
        from a segmented prefix scan, and per-ray reduction is ONE
        [K]-row scatter-add of packed (w*rgb, w, w*t) rows.

    Semantics match composite(mask=...) + capacity-overflow drop of the
    round-2 scatter/gather design bit-for-bit up to cumsum association:
    masked-out samples contribute nothing, kept samples beyond
    `capacity` are dropped (first-K-kept win), dropped rays composite
    to background.
    """
    B, S = mask.shape
    N = B * S
    capacity = min(capacity, N)
    vdim = viewdirs.shape[-1]
    flat_mask = mask.reshape(N)

    kept_incl = jnp.cumsum(flat_mask.astype(jnp.int32))      # [N] inclusive rank
    total = kept_incl[-1]
    keys = jnp.where(flat_mask, kept_incl - 1, N)            # kept k -> key k
    src = jax.lax.sort_key_val(
        keys, jnp.arange(N, dtype=jnp.int32), is_stable=True
    )[1][:capacity]                                          # [K] source slots
    valid = jnp.arange(capacity, dtype=jnp.int32) < total

    pack = jnp.concatenate(
        [
            positions.reshape(N, 3),
            jnp.broadcast_to(viewdirs[:, None, :], (B, S, vdim)).reshape(N, vdim),
            t.reshape(N, 1).astype(jnp.float32),
            deltas.reshape(N, 1).astype(jnp.float32),
        ],
        axis=1,
    )
    g = pack[src]                                            # [K, 5+vdim]

    rgb_c, sigma_c = field.apply(params, g[:, :3], g[:, 3 : 3 + vdim])
    sigma_c = jnp.where(valid, sigma_c.astype(jnp.float32), 0.0)
    t_c = g[:, 3 + vdim]
    dt_c = g[:, 4 + vdim]

    # composite() quadrature on ragged per-ray segments (invalid slots
    # have tau=0 -> alpha=0 -> w=0: they contribute nothing anywhere).
    tau = sigma_c * dt_c
    ray_id = src // S                                        # nondecreasing on valid prefix
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), ray_id[1:] != ray_id[:-1]]
    )
    transmittance = jnp.exp(-(_segmented_cumsum(tau, seg_start) - tau))
    alpha = 1.0 - jnp.exp(-tau)
    w = transmittance * alpha

    data = jnp.concatenate(
        [
            w[:, None] * rgb_c.astype(jnp.float32),
            w[:, None],
            (w * t_c)[:, None],
        ],
        axis=1,
    )                                                        # [K, 5]
    rid = jnp.where(valid, ray_id, B)
    out = jnp.zeros((B + 1, 5), jnp.float32).at[rid].add(data)[:B]
    out_rgb, acc, depth = out[:, :3], out[:, 3], out[:, 4]
    if white_background:
        out_rgb = out_rgb + (1.0 - acc)[:, None]
    empty = jnp.zeros((B, 0), jnp.float32)
    return RenderResult(out_rgb, acc, depth, empty, empty, jnp.zeros_like(acc))


def ray_keep_fraction(
    rays: Rays,
    occupancy: jnp.ndarray,
    grid_cfg: GridConfig,
    sampler_cfg: SamplerConfig,
    pool_res: Optional[int] = None,
) -> float:
    """Fraction of rays the ray-compaction keep rule retains — the XLA
    mirror of the kernel's pass-1 pooled tighten+mask (shared-semantics
    contract, see tighten_sample_mask_pallas).  Callers compare this
    against render_cfg.ray_compact_fraction BEFORE trusting a compacted
    render: kept rays beyond the static capacity silently render as
    background, and the keep fraction depends on the occupancy GRID —
    a trained EMA grid is much fatter than an analytic one (measured
    0.65-0.70 at 16^3 pooling on the hard-gate march checkpoint vs
    ~0.45 analytic; docs/KERNEL_NOTES.md round-3 addendum).

    `pool_res` overrides the pooling resolution: the keep rule's pooling
    is PIPELINE-specific (march pools at sampler.tighten_res; the fused
    renderer pools at min(render.fused_coarse_res, res) — pallas_fused2
    res_c), so callers guarding a fused render must pass the fused
    pooling, not inherit the march default."""
    res = grid_cfg.resolution
    occ3 = occupancy.reshape(res, res, res)
    t_res = min(pool_res or sampler_cfg.tighten_res or res, res)
    m_res = min(sampler_cfg.occupancy_mask_res or res, res)
    occ_t = occ3 if t_res == res else make_coarse_occupancy(occ3, res // t_res)
    # CDF-placement kernel configs (see make_grid_renderer kernel_n)
    # probe cdf_bins bin midpoints instead of samples_per_ray — mirror
    # that so the guard tests the keep rule that actually runs.
    # pool_res is the FUSED-pipeline override (fused callers pass
    # min(fused_coarse_res, res)); march callers MUST leave it None so this mirror
    # stays in charge of the march pooling and probe count.
    kernel_probes = (
        pool_res is None
        and sampler_cfg.tighten
        and m_res >= t_res
        and t_res < res
        and t_res <= 32
    )
    # CDF placement probes cdf_bins midpoints, both on the march kernel
    # path (kernel_probes) and on the fused path (explicit pool_res —
    # its keep rule is any(bins) from the res_t fold at cdf_bins
    # midpoints, see pallas_fused2._cdf_bins)
    n_mid = (
        sampler_cfg.cdf_bins
        if (kernel_probes or pool_res is not None)
        and sampler_cfg.placement in ("occupancy_cdf", "density_cdf")
        else sampler_cfg.samples_per_ray
    )
    o = rays.origins.reshape(-1, 3)
    d = rays.directions.reshape(-1, 3)
    te, tx = ray_aabb(o, d, grid_cfg.aabb_min, grid_cfg.aabb_max)
    te = jnp.maximum(te, sampler_cfg.near)
    tx = jnp.maximum(tx, te)
    te2, tx2 = tightened_range(
        o, d, te, tx, occ_t, grid_cfg, probes=sampler_cfg.tighten_probes
    )
    t, _ = march_samples_t(te2, tx2, n_mid)
    pts = sample_positions(o, d, t)
    m = (tx2[:, None] > te2[:, None]) & occupancy_lookup(pts, occ_t, grid_cfg)
    return float(jnp.any(m, axis=1).mean())


def split_occupancy_payload(occupancy, grid_cfg: GridConfig):
    """Dispatch the renderer `occupancy=` payload on dtype.

    bool  -> (bitfield3, None): occupancy_cdf / uniform placement.
    float -> (bitfield3, density3): the occupancy grid's density EMA;
             the bitfield is derived by the exact update_occupancy rule
             (ema > grid.density_threshold), so every occupancy decision
             (tighten, masks, kernels) is unchanged, and density-weighted
             CDF placement additionally sees the values.
    See occupancy.renderer_payload for the producing side."""
    if occupancy is None:
        return None, None
    r = grid_cfg.resolution
    arr = jnp.asarray(occupancy).reshape(r, r, r)
    if jnp.issubdtype(arr.dtype, jnp.bool_):
        return arr, None
    dens3 = arr.astype(jnp.float32)
    return dens3 > grid_cfg.density_threshold, dens3


def cdf_bin_weights(
    origins: jnp.ndarray,      # [B, 3]
    directions: jnp.ndarray,   # [B, 3]
    t0: jnp.ndarray,           # [B]
    t1: jnp.ndarray,           # [B]
    occ_m: jnp.ndarray,        # pooled bool bitfield (occupancy_mask_res)
    dens_m: Optional[jnp.ndarray],  # pooled f32 density (density_cdf only)
    grid_cfg: GridConfig,
    sampler_cfg: SamplerConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bin CDF placement weights + support mask, [B, P] each —
    the ONE definition shared by the renderer's cdf_place and the
    capacity planner (cdf_occupied_sample_fraction), so the quadrature
    and its capacity plan can never drift apart.

    occupancy_cdf: weight = support = the bin's occupancy bit (probed at
    the bin midpoint on the pooled occupancy_mask_res grid).

    density_cdf: the hierarchical-importance weighting of the classic
    NeRF coarse pass, at zero field cost — the coarse density is the
    occupancy grid's EMA (the cached result of update_occupancy's probes)
    instead of a second network: weight = T_b * (1 - exp(-sigma_b*dtb))
    with T_b the transmittance of the PRECEDING bins, so bins behind an
    opaque surface get (almost) no sample budget, unlike occupancy_cdf
    which spends equally on every occupied bin.  Support stays the
    occupancy BIT (sigma_b > threshold): occluded-but-occupied bins keep
    their (few) samples composited — compositing itself re-derives exact
    per-sample transmittance, so placement weights only steer budget,
    never bias the integral.  Weights are rescaled per ray so support
    bins average weight 1 (sum w = #support): cdf_floor then bounds the
    empty-space mass identically across placements, and with constant
    density the weighting reduces to occupancy_cdf's binary weights
    (alpha-weighting with T ~= 1), keeping one meaning for the knob.
    """
    P = sampler_cfg.cdf_bins
    span = t1 - t0
    tb = t0[..., None] + (
        (jnp.arange(P, dtype=jnp.float32) + 0.5) / P
    ) * span[..., None]
    pts = sample_positions(origins, directions, tb)
    pos_span = (span > 0)[..., None]
    if sampler_cfg.placement == "density_cdf":
        if dens_m is None:
            raise ValueError(
                "sampler.placement='density_cdf' needs the density-EMA "
                "payload (pass occupancy=occ.density_ema, see "
                "occupancy.renderer_payload), got a bool bitfield"
            )
        sigma = density_lookup_fast(pts, dens_m, grid_cfg)      # [B, P]
        support = (sigma > grid_cfg.density_threshold) & pos_span
        dtb = jnp.maximum(span, 0.0)[..., None] / P
        tau = sigma * dtb
        trans = jnp.exp(-(jnp.cumsum(tau, axis=-1) - tau))
        w = jnp.where(support, trans * (1.0 - jnp.exp(-tau)), 0.0)
        k = support.sum(axis=-1).astype(jnp.float32)
        w = w * (k / jnp.maximum(w.sum(axis=-1), 1e-12))[..., None]
    else:
        support = occupancy_lookup_fast(pts, occ_m, grid_cfg) & pos_span
        w = support.astype(jnp.float32)
    return w, support


def cdf_occupied_sample_fraction(
    rays: Rays,
    occupancy: jnp.ndarray,
    grid_cfg: GridConfig,
    sampler_cfg: SamplerConfig,
) -> jnp.ndarray:
    """Expected fraction of occupancy-CDF-placed samples landing in
    occupied bins — the capacity-planning number for the dense->compact
    switch when sampler.placement == "occupancy_cdf".  The cell-occupancy
    proxy the uniform switch uses is meaningless there: CDF placement
    concentrates samples in occupied cells BY DESIGN, so the occupied-
    SAMPLE fraction tracks each ray's occupied-bin mass
    K(1+floor)/(K(1+floor) + (P-K)floor), not the grid's cell count.

    Mirrors cdf_place's quadrature (tighten at tighten_res, P=cdf_bins
    probes on the pooled occupancy_mask_res grid) by CONSTRUCTION: the
    weights come from the same cdf_bin_weights the renderer places with,
    and the expected in-support sample fraction of stratified inverse-CDF
    placement is exactly sum_b pmf_b * support_b (for binary weights this
    reduces to the closed form K(1+floor)/(K(1+floor)+(P-K)floor)).

    `occupancy` is the renderer payload: bool bitfield (occupancy_cdf)
    or f32 density EMA (density_cdf).  Returns a scalar jnp array;
    callers jit it (one [B, P] lookup per occupancy update).
    """
    res = grid_cfg.resolution
    occ3, dens3 = split_occupancy_payload(occupancy, grid_cfg)
    t_res = min(sampler_cfg.tighten_res or res, res)
    m_res = min(sampler_cfg.occupancy_mask_res or res, res)
    pool = lambda occ, r: (
        occ if r == res else make_coarse_occupancy(occ, res // r)
    )
    o = rays.origins.reshape(-1, 3)
    d = rays.directions.reshape(-1, 3)
    te, tx = ray_aabb(o, d, grid_cfg.aabb_min, grid_cfg.aabb_max)
    te = jnp.maximum(te, sampler_cfg.near)
    tx = jnp.maximum(tx, te)
    if sampler_cfg.tighten:
        te, tx = tightened_range(
            o, d, te, tx, pool(occ3, t_res), grid_cfg,
            probes=sampler_cfg.tighten_probes,
        )
    dens_m = None
    if dens3 is not None and sampler_cfg.placement == "density_cdf":
        dens_m = (
            dens3 if m_res == res else make_coarse_density(dens3, res // m_res)
        )
    w, support = cdf_bin_weights(
        o, d, te, tx, pool(occ3, m_res), dens_m, grid_cfg, sampler_cfg
    )
    wf = w + jnp.float32(sampler_cfg.cdf_floor)
    pmf = wf / jnp.sum(wf, axis=-1, keepdims=True)
    return jnp.sum(pmf * support, axis=-1).mean()


def make_grid_renderer(
    field: NeRFField,
    grid_cfg: GridConfig,
    sampler_cfg: SamplerConfig,
    render_cfg: RenderConfig,
    strategy: str = "march",
    compact: bool = True,
    compact_fraction: Optional[float] = None,
    compact_capacity: Optional[int] = None,
    max_hits: Optional[int] = None,
):
    """Build render(params, rays, key=None, occupancy=None) -> RenderResult.

    occupancy: [res^3] / [res,res,res] bool bitfield; None = dense
    (reference behavior: march every crossed cell).
    """
    if strategy not in ("march", "intervals"):
        raise ValueError(f"unknown grid render strategy {strategy!r}")
    if sampler_cfg.placement not in ("uniform", "occupancy_cdf", "density_cdf"):
        # a typo must not silently render the uniform quadrature — the
        # placement is part of the train/eval quadrature contract
        raise ValueError(
            f"sampler.placement must be 'uniform', 'occupancy_cdf' or "
            f"'density_cdf', got {sampler_cfg.placement!r}"
        )
    if strategy == "intervals" and sampler_cfg.placement != "uniform":
        # intervals quadrature is per-cell (32 samples/interval); CDF
        # placement only exists on the march span — ignoring the knob
        # would silently break the train/eval quadrature contract
        raise ValueError(
            f"sampler.placement={sampler_cfg.placement!r} applies to the "
            "grid_march pipeline only; grid_intervals samples per cell "
            "interval (set sampler.placement=uniform)"
        )

    def render(
        params: dict,
        rays: Rays,
        key: Optional[jax.Array] = None,
        occupancy: Optional[jnp.ndarray] = None,
    ) -> RenderResult:
        # bool payload = bitfield; f32 payload = density EMA (bitfield
        # derived, values feed density_cdf placement) — see
        # split_occupancy_payload / occupancy.renderer_payload.
        occ3, dens3 = split_occupancy_payload(occupancy, grid_cfg)
        if (
            sampler_cfg.placement == "density_cdf"
            and occ3 is not None
            and dens3 is None
        ):
            raise ValueError(
                "sampler.placement='density_cdf' renderer was given a bool "
                "bitfield; pass the density EMA payload "
                "(occupancy.renderer_payload)"
            )

        def shade(origins, directions, viewdirs_tp, t, deltas, smask):
            """Field eval + compositing on explicit ray/sample arrays
            (shared by the direct paths and the ray-compacted path)."""
            pts = sample_positions(origins, directions, t)
            if strategy == "march" and compact and occ3 is not None:
                B_, S_ = pts.shape[0], pts.shape[1]
                frac = (
                    compact_fraction
                    if compact_fraction is not None
                    else render_cfg.compact_fraction
                )
                cap = compact_capacity or max(1, int(B_ * S_ * frac))
                return compacted_shade(
                    field, params, pts, viewdirs_tp, t, deltas, smask, cap,
                    render_cfg.white_background,
                )
            rgb, sigma = field.apply(params, pts, viewdirs_tp[..., None, :])
            return composite(
                rgb, sigma, deltas, t_mid=t, mask=smask,
                white_background=render_cfg.white_background,
            )

        if strategy == "intervals":
            iv = traverse_grid(
                rays.origins, rays.directions, grid_cfg, occupancy=occ3,
                max_hits=max_hits,
            )
            samples = interval_samples(
                iv.t_starts,
                iv.t_ends,
                iv.mask,
                sampler_cfg.samples_per_interval,
                mode=sampler_cfg.mode if key is not None else "regular",
                key=key,
            )
            t, deltas, smask = samples.t, samples.deltas, samples.mask
        else:  # march
            t_enter, t_exit = ray_aabb(
                rays.origins, rays.directions, grid_cfg.aabb_min, grid_cfg.aabb_max
            )
            t_enter = jnp.maximum(t_enter, sampler_cfg.near)
            t_exit = jnp.maximum(t_exit, t_enter)
            S = sampler_cfg.samples_per_ray
            res = grid_cfg.resolution
            t_res = min(sampler_cfg.tighten_res or res, res)
            m_res = min(sampler_cfg.occupancy_mask_res or res, res)
            pool = lambda occ, r: (
                occ if r == res else make_coarse_occupancy(occ, res // r)
            )
            # CDF placement (sampler.placement="occupancy_cdf" /
            # "density_cdf"): inverse-CDF stratified samples over
            # per-bin weights probed on the SAME pooled m_res grid the
            # mask uses, so train (jittered) and eval (midpoint) share
            # one quadrature contract.  Falls back to uniform without a
            # grid (constant weights = the identity warp).
            use_cdf = (
                sampler_cfg.placement in ("occupancy_cdf", "density_cdf")
                and occ3 is not None
            )
            dens_m = (
                None
                if dens3 is None or sampler_cfg.placement != "density_cdf"
                else (
                    dens3
                    if m_res == res
                    else make_coarse_density(dens3, res // m_res)
                )
            )

            def cdf_place(o_, d_, t0_, t1_, key_=None, pre=None):
                """pre = (weights, support) [.., P] to skip the XLA bin
                probes — the kernel-fold path feeds the Pallas mask."""
                if pre is None:
                    wb, support = cdf_bin_weights(
                        o_, d_, t0_, t1_, pool(occ3, m_res), dens_m,
                        grid_cfg, sampler_cfg,
                    )
                else:
                    wb, support = pre
                jit_ = (
                    jax.random.uniform(key_, (*t0_.shape, S), jnp.float32)
                    if key_ is not None
                    else None
                )
                s = cdf_ray_samples(
                    t0_, t1_, S, wb, floor=sampler_cfg.cdf_floor,
                    jitter=jit_, bin_support=support,
                )
                # s.mask is already the bin-support mask (each sample's
                # own probed bin) — no second per-sample lookup needed
                return s.t, s.deltas, s.mask
            # Fused Pallas tighten+mask kernel: eval-time (midpoint
            # quadrature, key is None) with both stages on one pooled
            # bitfield <= 32^3 — replaces the XLA probe gathers (~21% of
            # frame) and the per-sample occupancy gather (~40%).
            use_kernel = (
                occ3 is not None
                and sampler_cfg.tighten
                and key is None
                and m_res >= t_res
                and t_res < res
                and t_res <= 32
            )
            # CDF-fold: for occupancy_cdf on the kernel path with the
            # bin-probe grid == the kernel bitfield (m_res == t_res),
            # run the kernel at n_samples=cdf_bins — its phase-2
            # midpoint masks ARE the per-bin occupancy weights, so the
            # XLA bin probes (a [B, P] lookup per chunk) disappear and
            # one kernel launch yields tighten + weights + support.
            # density_cdf keeps the XLA probes: its weights need VALUES
            # (density_lookup_fast one-hot matmuls), not bits.
            fold_cdf = (
                use_kernel
                and use_cdf
                and m_res == t_res
                and sampler_cfg.placement == "occupancy_cdf"
            )
            # Under ANY CDF placement the kernel probes the cdf_bins
            # midpoints, not the S sample midpoints: the ray-compaction
            # keep rule (any occupied probe) must cover the positions the
            # placement distributes over, or a ray whose only occupied
            # pooled cells fall between S-probe midpoints is dropped to
            # background while the placement would have put supported
            # samples on it.  The pooled t_res bits are a superset of the
            # m_res support at the same probe positions, so keep=False
            # still implies every placed sample would be masked.
            kernel_n = sampler_cfg.cdf_bins if (use_kernel and use_cdf) else S
            if use_kernel:
                kernel = lambda o_, d_, te_, tx_: tighten_sample_mask_pallas(
                    o_, d_, te_, tx_,
                    pool(occ3, t_res), kernel_n, grid_cfg,
                    probes=sampler_cfg.tighten_probes,
                    interpret=jax.devices()[0].platform != "tpu",
                )

                def refine(mask_k, o_, d_, t0_, t1_):
                    # occupancy_mask_res finer than the kernel bitfield:
                    # intersect with the XLA lookup at m_res (the pooled
                    # t_res mask is a superset, so keep/drop decisions
                    # made on it never lose a true sample).  Affordable
                    # exactly where it matters — after ray compaction the
                    # per-sample gather runs on kept rays only.
                    if m_res == t_res:
                        return mask_k
                    t_, _ = march_samples_t(t0_, t1_, S)
                    pts_ = sample_positions(o_, d_, t_)
                    return mask_k & occupancy_lookup_fast(
                        pts_, pool(occ3, m_res), grid_cfg
                    )
                if render_cfg.ray_compact:
                    # RAY compaction (see RenderConfig.ray_compact): pass
                    # 1 finds rays with any occupied sample; per-ray
                    # scalars compact with cheap [B]-row gathers; pass 2
                    # re-derives span+mask for the kept rays (re-running
                    # the kernel beats gathering [B,S] masks at
                    # ~8 ns/element); background rays are reconstructed
                    # at scatter-back.  Kept rays beyond the static
                    # capacity also render as background — size
                    # ray_compact_fraction well above the scene's object
                    # pixel fraction (render_image's chunk interleaving
                    # makes per-chunk fractions ~equal to the global one).
                    B = rays.origins.shape[0]
                    cap = max(1, int(B * render_cfg.ray_compact_fraction))
                    _, _, mask_a = kernel(
                        rays.origins, rays.directions, t_enter, t_exit
                    )
                    keep = jnp.any(mask_a, axis=1)
                    packed = jnp.concatenate(
                        [
                            rays.origins, rays.directions, rays.viewdirs_tp,
                            t_enter[:, None], t_exit[:, None],
                        ],
                        axis=1,
                    )  # [B, 10]
                    buf, widx = compact_rows(keep, packed, cap)
                    o_c, d_c, v_c = buf[:, 0:3], buf[:, 3:6], buf[:, 6:8]
                    te_c, tx_c = buf[:, 8], buf[:, 9]
                    t0_c, t1_c, smask_c = kernel(o_c, d_c, te_c, tx_c)
                    if fold_cdf:
                        t_c, deltas_c, smask_c = cdf_place(
                            o_c, d_c, t0_c, t1_c,
                            pre=(smask_c.astype(jnp.float32), smask_c),
                        )
                    elif use_cdf:
                        t_c, deltas_c, smask_c = cdf_place(o_c, d_c, t0_c, t1_c)
                    else:
                        smask_c = refine(smask_c, o_c, d_c, t0_c, t1_c)
                        t_c, deltas_c = march_samples_t(t0_c, t1_c, S)
                    res_c = shade(o_c, d_c, v_c, t_c, deltas_c, smask_c)
                    out_pack = jnp.concatenate(
                        [res_c.rgb, res_c.acc[:, None], res_c.depth[:, None]],
                        axis=1,
                    )  # [cap, 5]
                    bgv = 1.0 if render_cfg.white_background else 0.0
                    bg_row = jnp.array([[bgv, bgv, bgv, 0.0, 0.0]], jnp.float32)
                    out_full = scatter_back(out_pack, widx, bg_row)
                    empty = jnp.zeros((B, 0), jnp.float32)
                    return RenderResult(
                        rgb=out_full[:, 0:3], acc=out_full[:, 3],
                        depth=out_full[:, 4], weights=empty,
                        transmittance=empty,
                        distortion=jnp.zeros_like(out_full[:, 3]),
                    )
                t_enter, t_exit, smask = kernel(
                    rays.origins, rays.directions, t_enter, t_exit
                )
                if fold_cdf:
                    t, deltas, smask = cdf_place(
                        rays.origins, rays.directions, t_enter, t_exit,
                        pre=(smask.astype(jnp.float32), smask),
                    )
                elif use_cdf:
                    t, deltas, smask = cdf_place(
                        rays.origins, rays.directions, t_enter, t_exit
                    )
                else:
                    smask = refine(smask, rays.origins, rays.directions,
                                   t_enter, t_exit)
                    t, deltas = march_samples_t(t_enter, t_exit, S)
            else:
                if occ3 is not None and sampler_cfg.tighten:
                    t_enter, t_exit = tightened_range(
                        rays.origins, rays.directions, t_enter, t_exit,
                        pool(occ3, t_res), grid_cfg,
                        probes=sampler_cfg.tighten_probes,
                    )
                if use_cdf:
                    t, deltas, smask = cdf_place(
                        rays.origins, rays.directions, t_enter, t_exit, key
                    )
                else:
                    jitter = (
                        jax.random.uniform(key, (*t_enter.shape, S), jnp.float32)
                        if key is not None
                        else None
                    )
                    t, deltas = march_samples_t(t_enter, t_exit, S, jitter=jitter)
                    smask = t_exit[..., None] > t_enter[..., None]
                    if occ3 is not None:
                        pts_probe = sample_positions(rays.origins, rays.directions, t)
                        smask = smask & occupancy_lookup_fast(
                            pts_probe, pool(occ3, m_res), grid_cfg
                        )

        return shade(rays.origins, rays.directions, rays.viewdirs_tp,
                     t, deltas, smask)

    return render
