"""Occupancy grid state + density-driven updates.

The reference builds a *static* dense grid of 512 AABBs into its OptiX AS
once (main.cu:154-174,394-399) and never prunes — every crossed cell is
marched.  The north-star capability (BASELINE.json config 5) adds what
Instant-NGP-style pipelines do: maintain a density EMA per cell, threshold
into a bitfield, and skip empty space.  Updates are pure functions of
(state, field params, rng) so they jit and shard cleanly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tnerf.config import GridConfig


class OccupancyGridState(NamedTuple):
    density_ema: jnp.ndarray  # [res, res, res] f32 EMA of sampled density
    bitfield: jnp.ndarray     # [res, res, res] bool occupied flags
    step: jnp.ndarray         # scalar i32 update counter


def init_occupancy(grid: GridConfig, mask=None) -> OccupancyGridState:
    """All-occupied start (matches the reference: all cells in the AS),
    or the static mesh mask when one is given (mesh-bounded scenes,
    grid.mesh_path — see grid.mesh.mesh_occupancy_mask).

    density_ema starts at 0 so the FIRST update already reflects the
    field (ema = max(0*decay, sigma) = sigma); the bitfield stays dense
    (within the mask) until that first update.
    """
    res = grid.resolution
    bits = (
        jnp.ones((res, res, res), bool)
        if mask is None
        else jnp.asarray(mask).reshape(res, res, res).astype(bool)
    )
    return OccupancyGridState(
        density_ema=jnp.zeros((res, res, res), jnp.float32),
        bitfield=bits,
        step=jnp.zeros((), jnp.int32),
    )


def cell_centers(grid: GridConfig) -> jnp.ndarray:
    """[res, res, res, 3] world-space cell centers."""
    res = grid.resolution
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    h = (hi - lo) / res
    idx = jnp.arange(res, dtype=jnp.float32) + 0.5
    ii, jj, kk = jnp.meshgrid(idx, idx, idx, indexing="ij")
    return lo + h * jnp.stack([ii, jj, kk], axis=-1)


def ema_threshold_update(
    density_ema: jnp.ndarray,
    sigma: jnp.ndarray,
    grid: GridConfig,
    mask=None,
) -> tuple:
    """(new_ema, bits) from one round of density probes — the ONE
    definition of the decay-max EMA + threshold (+ static-mask clamp)
    rule, shared by the replicated and the sharded update so
    single-chip and multi-chip training can never drift."""
    res = grid.resolution
    ema = jnp.minimum(density_ema * grid.ema_decay, 1e4)
    ema = jnp.maximum(ema, sigma)  # decay-max EMA (Instant-NGP update rule)
    if mask is not None:
        ema = jnp.where(jnp.asarray(mask).reshape(res, res, res), ema, 0.0)
    return ema, ema > grid.density_threshold


def update_occupancy(
    state: OccupancyGridState,
    density_fn,
    grid: GridConfig,
    key: jax.Array,
    mask=None,
) -> OccupancyGridState:
    """One occupancy refresh: jittered density probe per cell -> EMA ->
    threshold.

    density_fn: positions [..., 3] -> sigma [...] (typically
        `lambda x: field.density(params, x)`).
    One uniform jittered probe point per cell per update; the EMA
    integrates over updates (decay `grid.ema_decay`), so cells are
    effectively multi-sampled across time without a res^3 x K probe cost.
    mask: optional static [res,res,res] bool bound (mesh-bounded scenes):
    the bitfield — and the EMA itself — are clamped to it, so density
    blooming outside the mesh can never re-occupy excluded cells (and a
    density_cdf payload derives the same masked bits).
    """
    res = grid.resolution
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    h = (hi - lo) / res
    centers = cell_centers(grid)
    jitter = jax.random.uniform(key, centers.shape, jnp.float32, -0.5, 0.5) * h
    sigma = density_fn((centers + jitter).reshape(-1, 3)).reshape(res, res, res)
    ema, bits = ema_threshold_update(state.density_ema, sigma, grid, mask)
    return OccupancyGridState(
        density_ema=ema, bitfield=bits, step=state.step + 1
    )


def occupancy_fraction(state: OccupancyGridState) -> jnp.ndarray:
    return jnp.mean(state.bitfield.astype(jnp.float32))


def renderer_payload(state, sampler_cfg, grid_cfg):
    """The `occupancy=` argument for renderers built by this config.

    Renderers dispatch on dtype: a bool payload is the bitfield; an f32
    payload is the density EMA, from which they derive the bitfield
    (bits = ema > grid.density_threshold, the update_occupancy rule) AND
    the per-bin weights for density-weighted CDF placement
    (`sampler.placement="density_cdf"`).  Checkpoints already carry the
    EMA, so restored runs get the same payload either way.

    Dense start: before the first occupancy update (state.step == 0) the
    bitfield is all-ones but the EMA is all-zero — deriving bits from the
    raw EMA would mask EVERY sample and zero the training gradient for
    the whole grid.warmup_steps window.  The f32 payload therefore
    substitutes a constant density strictly above the threshold in every
    bitfield cell until the first update: bits derive back to exactly
    the init bitfield (all-ones, or the mesh mask for mesh-bounded
    scenes), and constant weights make density_cdf placement
    near-uniform — the same dense-start semantics the bool payload has.
    (jnp.where keeps the payload dtype static so the jitted train step
    never retraces at the warmup boundary.)"""
    if state is None:
        return None
    if sampler_cfg.placement == "density_cdf":
        fill = jnp.float32(2.0 * grid_cfg.density_threshold + 1.0)
        dense_start = jnp.where(state.bitfield, fill, 0.0)
        return jnp.where(state.step > 0, state.density_ema, dense_start)
    return state.bitfield
