"""Sample-parallel (SP) rendering: shard the samples-per-ray axis.

The long axis of the `grid_intervals` pipeline is samples-per-ray
(max_hits x samples_per_interval, e.g. 24 x 32 = 768 at reference
defaults — /root/reference/sampler/sampler.h:4 and main.cu:486).  DP
shards rays; this module shards the SAMPLE axis of each ray across a
second mesh axis, so one ray's quadrature spans several chips.  That is
the scaling story for very long rays (high max_hits, dense grids) where
the per-chip [B, S] working set, not the ray count, is the limit.

The emission-absorption integral is a prefix-product in transmittance —
sequential along S — but it SEGMENTS exactly: with the sample axis split
into contiguous device slices,

    T_global(i on device d) = T_local(i) * exp(-sum_{d' < d} tau_total_d')

so each device composites its slice locally (the same cumsum-based
quadrature as render/composite.py) scaled by one per-ray transmittance
offset, and per-ray outputs combine with a psum.  The cross-device data
is two tiny collectives over ICI — an all_gather of [B] per-slice
optical-depth totals and the final psum — NOT the [B, S] field arrays;
XLA never moves the big tensors.  Differentiable end-to-end (shard_map
+ collectives have exact VJPs; gradients flow through both the local
quadrature and the transmittance offsets).

Composes with DP on a 2-D ("data", "sample") mesh: rays shard over
"data", samples over "sample".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tnerf.cameras import Rays
from tnerf.config import GridConfig, RenderConfig, SamplerConfig
from tnerf.fields.nerf_field import NeRFField
from tnerf.grid.traversal import traverse_grid
from tnerf.render.composite import RenderResult
from tnerf.sampling import interval_samples, sample_positions


def sp_composite_local(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    deltas: jnp.ndarray,
    t_mid: Optional[jnp.ndarray],
    mask: Optional[jnp.ndarray],
    axis_name: str,
    white_background: bool = False,
) -> RenderResult:
    """Segmented composite over a sharded sample axis; call INSIDE
    shard_map with each device holding a contiguous [.., S/n] slice.

    Returns per-ray outputs replicated over `axis_name` (psum) and
    per-sample weights/transmittance for the LOCAL slice."""
    sigma = sigma.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    tau = sigma * deltas
    if mask is not None:
        tau = jnp.where(mask, tau, 0.0)

    # Transmittance offset: optical depth accumulated on earlier slices.
    tau_total = jnp.sum(tau, axis=-1)                      # [...]
    gathered = jax.lax.all_gather(tau_total, axis_name)    # [n, ...]
    n = gathered.shape[0]
    my = jax.lax.axis_index(axis_name)
    before = (
        jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < my
    ).reshape((n,) + (1,) * tau_total.ndim)
    prefix = jnp.sum(gathered * before, axis=0)            # [...]

    tau_cum = jnp.cumsum(tau, axis=-1) - tau               # exclusive, local
    transmittance = jnp.exp(-(tau_cum + prefix[..., None]))
    alpha = 1.0 - jnp.exp(-tau)
    weights = transmittance * alpha

    rgb_p = jnp.sum(weights[..., None] * rgb.astype(jnp.float32), axis=-2)
    acc_p = jnp.sum(weights, axis=-1)
    if t_mid is None:
        depth_p = jnp.zeros_like(acc_p)
    else:
        depth_p = jnp.sum(weights * t_mid.astype(jnp.float32), axis=-1)

    out_rgb = jax.lax.psum(rgb_p, axis_name)
    acc = jax.lax.psum(acc_p, axis_name)
    depth = jax.lax.psum(depth_p, axis_name)
    if white_background:
        out_rgb = out_rgb + (1.0 - acc)[..., None]
    # per-ray distortion needs CROSS-shard weight pairs (w_i w_j |t_i-t_j|
    # spans shard boundaries) — unsupported under SP; train_loop validates
    # distortion_weight against this path
    return RenderResult(
        out_rgb, acc, depth, weights, transmittance, jnp.zeros_like(acc)
    )


def make_sp_interval_renderer(
    field: NeRFField,
    grid_cfg: GridConfig,
    sampler_cfg: SamplerConfig,
    render_cfg: RenderConfig,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    sample_axis: str = "sample",
    max_hits: Optional[int] = None,
    model_axis: Optional[str] = None,
):
    """`grid_intervals` renderer with the sample axis sharded over
    `sample_axis` (and rays over `data_axis`, if given): traversal and
    sampling run ray-sharded; field eval + segmented compositing run
    under shard_map on [rays/dp, S/sp] blocks.

    The sample axis S = max_hits * samples_per_interval must divide by
    the sample-axis size.  Same call contract as make_grid_renderer's
    render(params, rays, key=None, occupancy=None).

    `model_axis` composes TABLE parallelism into the same shard_map
    (3-axis data x sample x model mesh): the hash-grid level tables
    enter level-sharded over `model_axis` and the encode runs via
    tp_encode_local (local levels + a tiled feature all_gather), so one
    shard_map carries all three axes — shard_maps do not nest, and this
    is the only way SP and TP coexist.  Requires a hashgrid field; the
    MLP params stay replicated.
    """
    n_sp = mesh.shape[sample_axis]
    H = max_hits if max_hits is not None else grid_cfg.effective_max_hits
    S_total = H * sampler_cfg.samples_per_interval
    if S_total % n_sp != 0:
        raise ValueError(
            f"sample axis {S_total} (max_hits {H} x samples_per_interval "
            f"{sampler_cfg.samples_per_interval}) must divide over "
            f"{n_sp} '{sample_axis}' devices"
        )
    dp = data_axis if data_axis is not None else None
    white = render_cfg.white_background

    inner_field = field
    if model_axis is not None:
        if field.config.encoding != "hashgrid":
            raise ValueError(
                "model_axis shards hash-grid level tables; "
                f"field encoding is {field.config.encoding!r}"
            )
        import dataclasses

        inner_field = dataclasses.replace(
            field,
            table_parallel=None,
            tp_inline=(model_axis, mesh.shape[model_axis]),
        )

    def inner(params, pts, vtp, t, deltas, smask):
        rgb, sigma = inner_field.apply(params, pts, vtp[..., None, :])
        return sp_composite_local(
            rgb, sigma, deltas, t, smask, sample_axis, white_background=white
        )

    def params_specs(params):
        """Per-leaf in_specs for the param tree: hash tables level-shard
        over model_axis, everything else replicates."""
        if model_axis is None:
            return P()

        def spec_for(path, leaf):
            keys = {getattr(k, "key", getattr(k, "name", None)) for k in path}
            if "tables" in keys and getattr(leaf, "ndim", 0) == 2:
                return P(model_axis, None)
            return P()

        return jax.tree_util.tree_map_with_path(spec_for, params)

    _cache: dict = {}

    def inner_sharded(params, *args):
        key = jax.tree_util.tree_structure(params)
        fn = _cache.get(key)
        if fn is None:
            fn = shard_map(
                inner,
                mesh=mesh,
                in_specs=(
                    params_specs(params),      # see above
                    P(dp, sample_axis, None),  # positions [B, S, 3]
                    P(dp, None),               # viewdirs [B, V]
                    P(dp, sample_axis),        # t
                    P(dp, sample_axis),        # deltas
                    P(dp, sample_axis),        # mask
                ),
                out_specs=RenderResult(
                    rgb=P(dp, None),
                    acc=P(dp),
                    depth=P(dp),
                    weights=P(dp, sample_axis),
                    transmittance=P(dp, sample_axis),
                    distortion=P(dp),
                ),
                check_vma=False,
            )
            _cache[key] = fn
        return fn(params, *args)

    n_dp = mesh.shape[data_axis] if data_axis is not None else 1

    def render(
        params: dict,
        rays: Rays,
        key: Optional[jax.Array] = None,
        occupancy: Optional[jnp.ndarray] = None,
    ) -> RenderResult:
        if rays.origins.shape[0] % n_dp != 0:
            raise ValueError(
                f"ray batch {rays.origins.shape[0]} must divide over "
                f"{n_dp} '{data_axis}' devices (check train.batch_size / "
                "render.chunk_size)"
            )
        occ3 = None
        if occupancy is not None:
            r = grid_cfg.resolution
            occ3 = occupancy.reshape(r, r, r)
        iv = traverse_grid(
            rays.origins, rays.directions, grid_cfg, occupancy=occ3,
            max_hits=H,
        )
        samples = interval_samples(
            iv.t_starts, iv.t_ends, iv.mask,
            sampler_cfg.samples_per_interval,
            mode=sampler_cfg.mode if key is not None else "regular",
            key=key,
        )
        pts = sample_positions(rays.origins, rays.directions, samples.t)
        return inner_sharded(
            params, pts, rays.viewdirs_tp, samples.t, samples.deltas,
            samples.mask,
        )

    return render
