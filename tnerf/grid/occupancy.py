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


def init_occupancy(grid: GridConfig) -> OccupancyGridState:
    """All-occupied start (matches the reference: all cells in the AS).

    density_ema starts at 0 so the FIRST update already reflects the
    field (ema = max(0*decay, sigma) = sigma); the bitfield stays dense
    until that first update.
    """
    res = grid.resolution
    return OccupancyGridState(
        density_ema=jnp.zeros((res, res, res), jnp.float32),
        bitfield=jnp.ones((res, res, res), bool),
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


def update_occupancy(
    state: OccupancyGridState,
    density_fn,
    grid: GridConfig,
    key: jax.Array,
) -> OccupancyGridState:
    """One occupancy refresh: jittered density probe per cell -> EMA ->
    threshold.

    density_fn: positions [..., 3] -> sigma [...] (typically
        `lambda x: field.density(params, x)`).
    One uniform jittered probe point per cell per update; the EMA
    integrates over updates (decay `grid.ema_decay`), so cells are
    effectively multi-sampled across time without a res^3 x K probe cost.
    """
    res = grid.resolution
    lo = jnp.asarray(grid.aabb_min, jnp.float32)
    hi = jnp.asarray(grid.aabb_max, jnp.float32)
    h = (hi - lo) / res
    centers = cell_centers(grid)
    jitter = jax.random.uniform(key, centers.shape, jnp.float32, -0.5, 0.5) * h
    sigma = density_fn((centers + jitter).reshape(-1, 3)).reshape(res, res, res)
    ema = jnp.minimum(state.density_ema * grid.ema_decay, 1e4)
    ema = jnp.maximum(ema, sigma)  # decay-max EMA (Instant-NGP update rule)
    bits = ema > grid.density_threshold
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
    substitutes a constant density strictly above the threshold until the
    first update: bits derive to all-occupied, and constant weights make
    density_cdf placement near-uniform — the same dense-start semantics
    the bool payload has.  (jnp.where keeps the payload dtype static so
    the jitted train step never retraces at the warmup boundary.)"""
    if state is None:
        return None
    if sampler_cfg.placement == "density_cdf":
        fill = jnp.float32(2.0 * grid_cfg.density_threshold + 1.0)
        return jnp.where(state.step > 0, state.density_ema, fill)
    return state.bitfield
