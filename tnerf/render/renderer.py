"""Ray -> pixel renderers: sampling + field evaluation + compositing.

This is the layer the reference wires by hand inside its batch loop
(main.cu:704-746: launchSampler -> network->forward -> launch_volrender),
including the wiring it gets wrong (the MLP input matrix is never filled —
defect D2).  Here a renderer is one pure function rays -> RenderResult,
jitted as a whole so XLA fuses encoding, MLP, and compositing.

Renderers come in two flavors:
- `make_uniform_renderer`: fixed-count sampling over [near, far]
  (BASELINE config 1; no grid).
- `make_grid_renderer` (tnerf.render.grid_renderer): occupancy-grid
  traversal -> interval sampling -> field -> composite (BASELINE config 2).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tnerf.cameras import Rays
from tnerf.config import RenderConfig, SamplerConfig
from tnerf.fields.nerf_field import NeRFField
from tnerf.render.composite import RenderResult, composite
from tnerf.sampling import sample_positions, uniform_ray_samples

RendererFn = Callable[[dict, Rays, Optional[jax.Array]], RenderResult]


def make_uniform_renderer(
    field: NeRFField,
    sampler_cfg: SamplerConfig,
    render_cfg: RenderConfig,
    mode: Optional[str] = None,
) -> RendererFn:
    """Renderer with fixed-count full-range sampling (no occupancy grid)."""
    mode = mode or sampler_cfg.mode

    def render(
        params: dict,
        rays: Rays,
        key: Optional[jax.Array] = None,
        occupancy: Optional[jnp.ndarray] = None,  # ignored: no grid
    ) -> RenderResult:
        batch_shape = rays.origins.shape[:-1]
        samples = uniform_ray_samples(
            sampler_cfg.near,
            sampler_cfg.far,
            sampler_cfg.samples_per_ray,
            batch_shape,
            mode=mode if key is not None else "regular",
            key=key,
        )
        pts = sample_positions(rays.origins, rays.directions, samples.t)
        rgb, sigma = field.apply(params, pts, rays.viewdirs_tp[..., None, :])
        res = composite(
            rgb,
            sigma,
            samples.deltas,
            t_mid=samples.t,
            mask=samples.mask,
            white_background=render_cfg.white_background,
        )
        return res

    return render


def _jitted_chunk_renderer(renderer: RendererFn, mesh, axis_name: str):
    """One cached jit per (renderer, mesh): the whole chunk (sampling +
    field + compositing) compiles to a single XLA program instead of
    paying per-op dispatch for every eval chunk.  Under a mesh, rays are
    sharded across devices and params/occupancy replicated
    (the eval-time analog of DP training).

    The cache lives ON the renderer object (not in a module-level
    lru_cache): every build_renderer call creates a fresh closure, so a
    global cache would never hit across builds and would pin up to
    maxsize dead compiled executables for the process lifetime."""
    cache = getattr(renderer, "_jit_cache", None)
    if cache is None:
        cache = {}
        try:
            renderer._jit_cache = cache
        except AttributeError:
            pass  # exotic callable without __dict__: fall through, uncached
    key = (mesh, axis_name)
    if key not in cache:
        if mesh is None:
            jitted = jax.jit(lambda p, r, k, o: renderer(p, r, k, o))
        else:
            from tnerf.parallel.mesh import dp_render_sharded

            jitted = dp_render_sharded(renderer, mesh, axis_name)
        cache[key] = jitted
    return cache[key]


def render_image(
    renderer: RendererFn,
    params: dict,
    rays: Rays,
    chunk_size: int = 65536,
    key: Optional[jax.Array] = None,
    occupancy: Optional[jnp.ndarray] = None,
    mesh=None,
    axis_name: str = "data",
) -> RenderResult:
    """Render a full [H, W] ray grid in fixed-size jitted chunks.

    Chunks are static-shape (padded), so exactly one compile services every
    image size; this is the render-an-image capability the reference
    intended but never built (stb_image_write.h included at main.cu:19-21,
    never called).  With `mesh`, each chunk's rays are sharded across the
    mesh devices (params replicated) — multi-chip eval rendering.
    """
    h, w = rays.origins.shape[:2]
    n = h * w
    flat = Rays(
        origins=rays.origins.reshape(n, 3),
        directions=rays.directions.reshape(n, 3),
        viewdirs_tp=rays.viewdirs_tp.reshape(n, 2),
    )
    n_pad = ((n + chunk_size - 1) // chunk_size) * chunk_size
    pad = n_pad - n
    flat = jax.tree.map(lambda a: jnp.pad(a, ((0, pad), (0, 0))), flat)
    n_chunks = n_pad // chunk_size
    if n_chunks > 1:
        # Interleave rays across chunks (ray j*n_chunks+i -> chunk i):
        # contiguous scanline chunks have wildly varying object-pixel
        # fractions (center rows ~all object), which would overflow the
        # ray-compaction capacity; strided chunks each see ~the global
        # fraction.  Pure transpose (bandwidth), inverted after render;
        # per-ray outputs are order-independent.
        inter = lambda a: (
            a.reshape(chunk_size, n_chunks, *a.shape[1:])
            .swapaxes(0, 1)
            .reshape(n_pad, *a.shape[1:])
        )
        flat = jax.tree.map(inter, flat)
    chunk_fn = _jitted_chunk_renderer(renderer, mesh, axis_name)
    outs = []
    for i in range(0, n_pad, chunk_size):
        chunk = jax.tree.map(lambda a: jax.lax.dynamic_slice_in_dim(a, i, chunk_size), flat)
        outs.append(chunk_fn(params, chunk, key, occupancy))
    res = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
    if n_chunks > 1:
        deinter = lambda a: (
            a.reshape(n_chunks, chunk_size, *a.shape[1:])
            .swapaxes(0, 1)
            .reshape(n_pad, *a.shape[1:])
        )
        res = jax.tree.map(deinter, res)
    unflat = lambda a: a[:n].reshape(h, w, *a.shape[1:])
    return RenderResult(
        rgb=unflat(res.rgb),
        acc=unflat(res.acc),
        depth=unflat(res.depth),
        weights=unflat(res.weights),
        transmittance=unflat(res.transmittance),
        distortion=unflat(res.distortion),
    )
