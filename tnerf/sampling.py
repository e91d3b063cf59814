"""Sample generation along rays.

TPU-native replacement for reference sampler/ (sampler.cu, sampler.h):
three modes — REGULAR, STRATIFIED_JITTERING, UNIFORM (sampler.h:5-9) —
with 32 samples per interval (sampler.h:4), and a *working* RNG: per-ray
threefry keys via fold_in, instead of one thrust::minstd_rand passed by
value to every thread (defect D10: every reference thread draws identical
randoms).

Two sampling paths:

1. `uniform_ray_samples` — fixed-count sampling over [near, far] per ray
   (no grid; BASELINE config 1 and the fast fused-march path).
2. `interval_samples` — the reference's semantics: per traversal interval
   [t0, t1) from the occupancy grid, emit S samples at in-interval
   fractions (sampler.cu:38-99), flattened to a static [B, MAX_HITS*S]
   sample axis with a validity mask (static shapes instead of the
   reference's thrust scan + ragged host repack, main.cu:631-674).

All outputs are (t, deltas, mask); positions are formed by the caller as
o + t*d so sampling stays geometry-free and trivially shardable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

MODES = ("regular", "stratified", "uniform")


class RaySamples(NamedTuple):
    t: jnp.ndarray       # [..., S] sample depths along the ray
    deltas: jnp.ndarray  # [..., S] quadrature step per sample
    mask: jnp.ndarray    # [..., S] bool validity


def _check_mode(mode: str) -> None:
    if mode not in MODES:
        raise ValueError(f"sampling mode must be one of {MODES}, got {mode!r}")


def uniform_ray_samples(
    near: float,
    far: float,
    n_samples: int,
    batch_shape: tuple,
    mode: str = "regular",
    key: Optional[jax.Array] = None,
) -> RaySamples:
    """Fixed-count samples over the global [near, far] range.

    regular:    midpoints of a uniform partition.
    stratified: one uniform draw per stratum (standard NeRF jitter).
    uniform:    iid uniform over [near, far], sorted along the ray.
    """
    _check_mode(mode)
    edges = jnp.linspace(near, far, n_samples + 1, dtype=jnp.float32)
    width = (far - near) / n_samples
    if mode == "regular":
        t = jnp.broadcast_to(0.5 * (edges[:-1] + edges[1:]), (*batch_shape, n_samples))
    elif mode == "stratified":
        if key is None:
            raise ValueError("stratified sampling requires a PRNG key")
        u = jax.random.uniform(key, (*batch_shape, n_samples), jnp.float32)
        t = edges[:-1] + u * width
    else:  # uniform
        if key is None:
            raise ValueError("uniform sampling requires a PRNG key")
        u = jax.random.uniform(key, (*batch_shape, n_samples), jnp.float32)
        t = jnp.sort(near + u * (far - near), axis=-1)
    if mode == "uniform":
        # deltas from consecutive samples; last closes to `far`
        deltas = jnp.diff(t, axis=-1, append=jnp.full((*batch_shape, 1), far, jnp.float32))
    else:
        deltas = jnp.full((*batch_shape, n_samples), width, jnp.float32)
    mask = jnp.ones(t.shape, bool)
    return RaySamples(t=t, deltas=deltas, mask=mask)


def interval_samples(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    hit_mask: jnp.ndarray,
    samples_per_interval: int,
    mode: str = "regular",
    key: Optional[jax.Array] = None,
) -> RaySamples:
    """Per-interval sampling (reference generate_samples semantics).

    t_starts, t_ends: [..., H] interval bounds in ray-t (monotone along
        the ray by DDA construction — fixing defect D5's t reset).
    hit_mask: [..., H] bool — which interval slots are real hits
        (the static-shape replacement for reference num_hits + indices).
    Returns RaySamples with sample axis H * samples_per_interval.

    Quadrature step for every sample in interval j is (t1-t0)/S — each
    interval integrates independently; gaps between intervals are empty
    space skipped by the grid and contribute nothing.
    """
    _check_mode(mode)
    S = samples_per_interval
    *batch, H = t_starts.shape
    length = (t_ends - t_starts) / S  # [..., H] per-sample step
    if mode == "regular":
        # midpoint rule inside each interval (the reference uses the left
        # edge, sampler.cu:55-66; midpoint is strictly better quadrature)
        frac = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        frac = jnp.broadcast_to(frac, (*batch, H, S))
    elif mode == "stratified":
        if key is None:
            raise ValueError("stratified sampling requires a PRNG key")
        u = jax.random.uniform(key, (*batch, H, S), jnp.float32)
        frac = (jnp.arange(S, dtype=jnp.float32) + u) / S
    else:  # uniform within the interval, sorted so t stays monotone
        if key is None:
            raise ValueError("uniform sampling requires a PRNG key")
        u = jax.random.uniform(key, (*batch, H, S), jnp.float32)
        frac = jnp.sort(u, axis=-1)
    t = t_starts[..., None] + frac * (t_ends - t_starts)[..., None]  # [..., H, S]
    deltas = jnp.broadcast_to(length[..., None], t.shape)
    mask = jnp.broadcast_to(hit_mask[..., None], t.shape)
    flat = lambda a: a.reshape(*batch, H * S)
    return RaySamples(t=flat(t), deltas=flat(deltas), mask=flat(mask))


def sample_positions(origins: jnp.ndarray, directions: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """o + t*d: [..., 3], [..., 3], [..., S] -> [..., S, 3]."""
    return origins[..., None, :] + directions[..., None, :] * t[..., :, None]


def cdf_ray_samples(
    t_enter: jnp.ndarray,
    t_exit: jnp.ndarray,
    n_samples: int,
    bin_weights: jnp.ndarray,
    floor: float = 0.01,
    jitter: Optional[jnp.ndarray] = None,
    bin_support: Optional[jnp.ndarray] = None,
) -> RaySamples:
    """Inverse-CDF stratified placement of S samples over each ray's
    [t_enter, t_exit] span from per-bin weights (occupancy-importance
    sampling; `sampler.placement="occupancy_cdf"`).

    Uniform midpoint marching wastes its fixed budget on empty space:
    on the trained hard-gate grid only ~16% of TIGHTENED-span samples
    land in occupied cells (docs/KERNEL_NOTES.md) — the occupancy mask
    zeroes the rest.  Placing samples by the inverse CDF of per-bin
    occupancy weights concentrates the same budget on the occupied
    sub-segments instead.

    Construction (stratified importance sampling, per ray):
      - bin_weights [..., P] >= 0 get `floor` added (every bin keeps
        support: the occupancy grid is a conservative mask, and a ray
        with no occupied probe must not divide by zero), normalized to
        a pmf/CDF over u in [0, 1];
      - sample s sits at stratum center u_s = (s + 0.5)/S in the warped
        coordinate (`jitter` [..., S] in [0,1) places it uniformly
        within its stratum instead — the stratified mode) and maps
        through the piecewise-linear inverse CDF to t_s (monotone in s);
      - the quadrature step is the POINT Jacobian of the warp at the
        sample's own bin: delta_s = (span/P) / (pmf_b(s) * S).  NOT the
        stratum-edge t-difference: a stratum straddling an occupancy
        boundary would smear its empty-space extent into an occupied
        sample's tau = sigma*delta (measured +0.03 rgb bias at S=8 on a
        slab scene), while the point Jacobian charges each sample
        exactly its own bin's density.  Masked (empty-bin) samples get
        LARGE deltas (1/floor-ish) — callers must intersect the
        returned mask with their occupancy mask so those samples are
        excluded from compositing, which they do anyway by contract.

    With constant weights this reduces exactly to march_samples_t
    (uniform bins -> identity warp, delta = span/S).  Returns
    RaySamples with mask = (span > 0) & (the sample's own bin is in the
    importance distribution's support) — by default bins with nonzero
    PRE-floor weight; `bin_support` [..., P] bool overrides the support
    indicator for weightings whose placement weight and keep rule differ
    (density_cdf: weight = transmittance-scaled alpha, support = the
    occupancy bit, so a bin BEHIND an opaque surface keeps its samples
    composited — with near-zero placement budget — instead of being
    masked out).  Support is gathered from the bins already probed (one
    within-row lane gather); callers need no second per-sample occupancy
    lookup, and the mask rule is exactly what
    cdf_occupied_sample_fraction capacity-plans for.  Bins are finer
    along the ray than a fine grid cell at production settings (span/64
    vs 2/res), so support masking loses no resolution versus a
    positional lookup."""
    if not floor > 0.0:
        raise ValueError(
            f"cdf floor must be > 0 (got {floor}): a ray whose probes are "
            "all empty would otherwise divide 0/0 into NaN positions"
        )
    P = bin_weights.shape[-1]
    span = jnp.maximum(t_exit - t_enter, 0.0)
    w = bin_weights.astype(jnp.float32) + jnp.float32(floor)
    csum = jnp.cumsum(w, axis=-1)
    total = csum[..., -1:]
    pmf = w / total                                            # [..., P]
    cdf = jnp.concatenate(
        [jnp.zeros_like(total), csum / total], axis=-1
    )                                                          # [..., P+1]

    if jitter is not None:
        u_pts = (jnp.arange(n_samples, dtype=jnp.float32) + jitter) / n_samples
    else:
        u_pts = jnp.broadcast_to(
            (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples,
            (*span.shape, n_samples),
        )

    # bin index of each query: #{p : cdf[p+1] < u}, in [0, P-1]
    idx = jnp.sum(
        cdf[..., 1:-1][..., None, :] < u_pts[..., :, None], axis=-1
    ).astype(jnp.int32)
    # Per-sample bin lookups as ONE-HOT masked sums, NOT take_along_axis:
    # XLA row gathers cost ~8 ns/element on TPU (the measured pathology
    # every other lookup in this codebase routes around) — at an 800x800
    # render chunk that is ~46 M gathered elements, and it cut the CDF
    # render tiers to a FIFTH of their uniform-placement fps before this
    # change (BENCH r4: fused_cdf 1.77 vs turbo 8.55 fps; hashgrid S=24
    # cdf 0.84 vs S=48 uniform 2.0).  The one-hot compare + multiply +
    # sum fuses into VPU elementwise passes, and selecting one f32 per
    # row with a 0/1 mask is bit-exact vs the gather.
    ohf = (
        idx[..., None] == jnp.arange(P, dtype=jnp.int32)
    ).astype(jnp.float32)                                      # [..., S, P]
    pick = lambda v: jnp.sum(ohf * v[..., None, :], axis=-1)
    c0 = pick(cdf[..., :-1])
    pmf_s = pick(pmf)
    frac = (u_pts - c0) / jnp.maximum(pmf_s, 1e-12)
    x = (idx.astype(jnp.float32) + frac) / P
    t = t_enter[..., None] + x * span[..., None]
    deltas = (span[..., None] / P) / (pmf_s * n_samples)
    support = (
        bin_weights.astype(jnp.float32) > 0
        if bin_support is None
        else bin_support
    )
    in_support = pick(support.astype(jnp.float32)) > 0.5
    mask = (span > 0)[..., None] & in_support
    return RaySamples(t=t, deltas=deltas, mask=mask)
