"""Baked-field fast rendering (SNeRG/FastNeRF-style, TPU formulation).

The quality field families (hashgrid 42.65 dB, triplane 41.56, CP 41.58
— configs/README.md) render at 1.2-2.0 fps because every sample pays the
encode+MLP (the one-hot encode binds; docs/KERNEL_NOTES.md round-4
addendum 2).  Baking evaluates the trained field ONCE into a dense
vertex grid (density + RGB), after which rendering is a per-sample grid
LOOKUP — no field math at all.  This is the standard fast-render move
(SNeRG bakes NeRF into a sparse voxel grid; FastNeRF factorizes and
caches), re-shaped for TPU:

  - the baked table is a flat [R^3, 4] (or brick-packed [R^3, 32]) array
    in HBM; per-sample fetches are BULK XLA gathers (bulk gathers are
    fine on TPU at ~8 ns/row — per-step gathers are not; KERNEL_NOTES);
  - `BakedField` exposes the same `.apply(params, pts, viewdirs)`
    protocol as NeRFField, so the production march renderer
    (make_grid_renderer) supplies tighten / occupancy-CDF placement /
    ray compaction unchanged — one sampling semantics, maintained once;
  - three lookup modes trade gather count vs memory:
      nearest         1 gather of 4ch   (R^3 * 4 values)
      trilinear       8 gathers of 4ch  (R^3 * 4)
      trilinear_brick 1 gather of 32ch  (R^3 * 32: each vertex row holds
                       its 2x2x2 neighbor corners, so interpolation
                       needs a single row fetch)

View dependence: the bake queries the field at one direction per vertex
(default: inward radial, the direction a camera on the standard orbit
sphere sees that point from).  Lambertian scenes (the procedural gates'
analytic GT is position-only — tnerf/data/procedural.py:analytic_field)
lose nothing; strongly view-dependent captures should render the field
directly or extend the bake with an SH/deferred branch.

Role match: the interactive-rate render intent of the reference
(/root/reference/main.cu:19-21 write intent; rtx/src/optixPrograms.cu:43-116
RT-core render loop) at the rates RT cores exist for.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tnerf.config import GridConfig


@dataclasses.dataclass(frozen=True)
class BakedField:
    """Duck-typed NeRFField replacement: `.apply(params, pts, viewdirs)`
    -> (rgb, sigma) via baked-table lookups.  `params` IS the baked
    table pytree ({"table": [R^3, C]}), so the renderer's params slot
    carries it through jit like any other field's weights.

    sigma_space "log1p": the table's 4th channel holds log1p(sigma) and
    lookups return expm1 AFTER interpolation.  Learned fields carry
    sigma spikes of 1e2-1e4 at surfaces; linear interpolation of raw
    sigma smears those spikes across whole cells, while interpolating
    in log space keeps boundaries sharp (measured on the hard analytic
    field: 51.7 -> 60.2 dB bake fidelity at 256^3)."""

    bake_res: int
    grid: GridConfig
    mode: str = "trilinear_brick"  # nearest | trilinear | trilinear_brick
    sigma_space: str = "linear"    # linear | log1p (must match the bake)

    def _uvw(self, positions):
        """Align-corners vertex coordinates: u in [0, R-1] per axis."""
        lo = jnp.asarray(self.grid.aabb_min, jnp.float32)
        hi = jnp.asarray(self.grid.aabb_max, jnp.float32)
        R = self.bake_res
        return (positions - lo) / (hi - lo) * (R - 1)

    def _sigma(self, s):
        if self.sigma_space == "log1p":
            return jnp.expm1(jnp.maximum(s, 0.0))
        return s

    def apply(self, params, positions, viewdirs=None):
        """positions [..., 3] -> (rgb [..., 3], sigma [...]); viewdirs
        ignored (baked diffuse)."""
        table = params["table"]
        R = self.bake_res
        u = self._uvw(positions)
        if self.mode == "nearest":
            idx = jnp.clip(jnp.round(u).astype(jnp.int32), 0, R - 1)
            flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]
            v = table[flat].astype(jnp.float32)  # [..., 4]
            return v[..., 0:3], self._sigma(v[..., 3])
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, R - 2)
        f = jnp.clip(u - i0.astype(jnp.float32), 0.0, 1.0)  # [..., 3]
        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        w = [
            (1 - fx) * (1 - fy) * (1 - fz), (1 - fx) * (1 - fy) * fz,
            (1 - fx) * fy * (1 - fz), (1 - fx) * fy * fz,
            fx * (1 - fy) * (1 - fz), fx * (1 - fy) * fz,
            fx * fy * (1 - fz), fx * fy * fz,
        ]  # corner order: (dx, dy, dz) lexicographic, z fastest
        if self.mode == "trilinear_brick":
            flat = (i0[..., 0] * R + i0[..., 1]) * R + i0[..., 2]
            rows = table[flat].astype(jnp.float32)  # [..., 32]
            v = sum(
                w[c][..., None] * rows[..., 4 * c: 4 * c + 4]
                for c in range(8)
            )
            return v[..., 0:3], self._sigma(v[..., 3])
        # trilinear: 8 separate 4ch gathers
        v = 0.0
        c = 0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    flat = (
                        (i0[..., 0] + dx) * R + (i0[..., 1] + dy)
                    ) * R + (i0[..., 2] + dz)
                    v = v + w[c][..., None] * table[flat].astype(jnp.float32)
                    c += 1
        return v[..., 0:3], self._sigma(v[..., 3])


def bake_positions(bake_res: int, grid: GridConfig) -> jnp.ndarray:
    """[R^3, 3] align-corners vertex positions spanning the AABB."""
    lo = np.asarray(grid.aabb_min, np.float32)
    hi = np.asarray(grid.aabb_max, np.float32)
    ax = [np.linspace(lo[a], hi[a], bake_res, dtype=np.float32)
          for a in range(3)]
    gx, gy, gz = np.meshgrid(*ax, indexing="ij")
    return jnp.asarray(
        np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    )


def bake_field(
    field,
    params,
    grid: GridConfig,
    bake_res: int = 256,
    # 64K, not bigger: the axon remote-compile relay rejects very large
    # programs (HTTP 413 at 256K-sample one-hot encode chunks), and the
    # per-chunk overhead is negligible at 64 dispatches per 256^3 bake
    chunk: int = 65536,
    view_mode: str = "radial_in",
    occupancy: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    sigma_space: str = "log1p",
) -> jnp.ndarray:
    """Evaluate the trained field over the vertex grid -> [R^3, 4]
    (rgb, sigma) table.

    view_mode "radial_in": viewdir = -normalize(p) — the direction a
    camera on the standard outward orbit sees vertex p from.  "fixed_z":
    -z for every vertex (debug).

    occupancy: optional fine bitfield — vertices in cells that are
    unoccupied AND not adjacent to an occupied cell are ZEROED after
    evaluation (sigma=0, rgb=0), so stale field values can never leak
    into empty space through interpolation.  The full grid is still
    evaluated (16.7M vertices at 256^3 is seconds on the MXU paths;
    masking compute would cost more in gathers than it saves).
    """
    from tnerf.cameras import viewdirs_to_thetaphi
    from tnerf.grid.traversal import occupancy_lookup

    pts_all = bake_positions(bake_res, grid)
    n = pts_all.shape[0]
    keep = None
    if occupancy is not None:
        res = grid.resolution
        occ3 = occupancy.reshape(res, res, res)
        # dilate by one cell so surface-adjacent vertices get real
        # values — CLAMPED shifts (pad+slice), not jnp.roll: roll would
        # wrap occupancy at one AABB face onto the opposite face and
        # keep stale values there
        occ_d = occ3
        for ax in range(3):
            pw = [(0, 0)] * 3
            pw[ax] = (1, 1)
            p = jnp.pad(occ3, pw)
            lo_sl = [slice(None)] * 3
            hi_sl = [slice(None)] * 3
            lo_sl[ax] = slice(0, res)
            hi_sl[ax] = slice(2, res + 2)
            occ_d = occ_d | p[tuple(lo_sl)] | p[tuple(hi_sl)]
        keep = occupancy_lookup(pts_all, occ_d, grid)

    @jax.jit
    def eval_chunk(p):
        if view_mode == "radial_in":
            d = -p / jnp.maximum(
                jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-6
            )
        else:
            d = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, -1.0], jnp.float32), p.shape
            )
        tp = viewdirs_to_thetaphi(d)
        rgb, sigma = field.apply(params, p, tp)
        if sigma_space == "log1p":
            sigma = jnp.log1p(jnp.maximum(sigma, 0.0))
        return jnp.concatenate([rgb, sigma[..., None]], axis=-1)

    out = np.zeros((n, 4), np.float32)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        p = pts_all[s:e]
        pad = (-(e - s)) % 1024
        if pad:
            p = jnp.pad(p, ((0, pad), (0, 0)))
        v = np.asarray(eval_chunk(p))[: e - s]
        out[s:e] = v
    if keep is not None:
        out *= np.asarray(keep)[:, None]
    return jnp.asarray(out, dtype)


def brick_pack(table: jnp.ndarray, bake_res: int) -> jnp.ndarray:
    """[R^3, 4] -> [R^3, 32]: row v holds the 2x2x2 corner block starting
    at v (clamped at the +1 faces), so trilinear needs ONE row gather.
    Corner order matches BakedField.apply (dx, dy, dz lexicographic)."""
    R = bake_res
    t3 = table.reshape(R, R, R, 4)

    def shift(a, d, ax):
        if d == 0:
            return a
        # clamped +1 shift: last slice repeats (weight there is 0 for
        # in-range samples; i0 is clipped to R-2)
        moved = jnp.roll(a, -1, axis=ax)
        idx = [slice(None)] * 4
        idx[ax] = -1
        return moved.at[tuple(idx)].set(a[tuple(idx)])

    parts = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = shift(shift(shift(t3, dx, 0), dy, 1), dz, 2)
                parts.append(c)
    return jnp.concatenate(parts, axis=-1).reshape(R ** 3, 32)


def make_baked_renderer(
    baked_table: jnp.ndarray,
    bake_res: int,
    grid_cfg: GridConfig,
    sampler_cfg,
    render_cfg,
    mode: str = "trilinear_brick",
    sigma_space: str = "log1p",
):
    """render(rays, key=None, occupancy=None) -> RenderResult through the
    PRODUCTION march renderer (tighten + CDF placement + ray compaction,
    grid_renderer.make_grid_renderer) with the baked field as the shade
    stage.  Per-sample compaction is forced off: a lookup costs one
    gather — compacting it would cost more than it saves (the same
    measurement that turned render.compact off for the frequency MLP).
    """
    import jax

    from tnerf.render.grid_renderer import make_grid_renderer

    bf = BakedField(bake_res=bake_res, grid=grid_cfg, mode=mode,
                    sigma_space=sigma_space)
    # bf16 BEFORE brick packing: packing concatenates 8 shifted copies
    # of the table, and doing that in f32 at 320^3 transiently holds
    # ~9 GB (measured ResourceExhausted on the 16 GB chip); in bf16 the
    # whole build fits easily and the stored table is half the HBM.
    # The table must also ride as a jit ARGUMENT — a closure constant
    # of this size gets embedded in the lowered program (2.15 GB of
    # captured constants) and rejected by the remote-compile relay.
    # Lookups cast back to f32 (BakedField).
    t16 = baked_table.astype(jnp.bfloat16)
    table = (
        brick_pack(t16, bake_res)
        if mode == "trilinear_brick" and baked_table.shape[-1] == 4
        else t16
    )
    params = {"table": jax.device_put(table)}
    rend = make_grid_renderer(
        bf, grid_cfg, sampler_cfg, render_cfg, strategy="march",
        compact=False,
    )

    def render(params_, rays, key=None, occupancy=None):
        """Standard RendererFn signature.  Pass `render.params` (the
        baked-table pytree) as params so the table is a traced jit
        argument; params=None falls back to the closure (fine outside
        jit / on CPU, but captures the table as a program constant)."""
        return rend(params_ if params_ is not None else params,
                    rays, key, occupancy)

    render.params = params
    return render
