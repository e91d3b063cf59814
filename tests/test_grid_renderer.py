"""Grid renderer tests: march & interval strategies must agree with the
dense uniform renderer on a fully-occupied grid (same quadrature, denser
sampling), and compaction must be exact vs non-compacted eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnerf.cameras import Rays, viewdirs_to_thetaphi
from tnerf.config import Config
from tnerf.fields.nerf_field import NeRFField
from tnerf.grid.occupancy import init_occupancy
from tnerf.render.composite import composite
from tnerf.render.grid_renderer import compacted_shade, make_grid_renderer


@pytest.fixture(scope="module")
def setup():
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
        "sampler.samples_per_ray=64", "sampler.samples_per_interval=8",
        "grid.resolution=8",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n = 32
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = Rays(
        origins=jnp.asarray(o),
        directions=jnp.asarray(d),
        viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)),
    )
    return cfg, field, params, rays


def test_march_and_intervals_agree_when_dense(setup):
    """Both strategies integrate the same field over the same geometry;
    with a dense grid and fine sampling they must produce near-identical
    pixels."""
    cfg, field, params, rays = setup
    march = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                               strategy="march", compact=False)
    ivals = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                               strategy="intervals")
    occ = init_occupancy(cfg.grid).bitfield
    r1 = march(params, rays, None, occ)
    r2 = ivals(params, rays, None, occ)
    # 64 uniform samples vs 8/interval x ~12 intervals: both fine enough
    np.testing.assert_allclose(np.asarray(r1.rgb), np.asarray(r2.rgb), atol=0.03)
    np.testing.assert_allclose(np.asarray(r1.acc), np.asarray(r2.acc), atol=0.03)


def test_intervals_dense_matches_none_occupancy(setup):
    cfg, field, params, rays = setup
    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="intervals")
    occ = init_occupancy(cfg.grid).bitfield
    r1 = rend(params, rays, None, occ)
    r2 = rend(params, rays, None, None)  # None = reference dense behavior
    np.testing.assert_allclose(np.asarray(r1.rgb), np.asarray(r2.rgb), atol=1e-5)


def test_compaction_exact_when_capacity_sufficient(setup):
    cfg, field, params, rays = setup
    occ = init_occupancy(cfg.grid).bitfield
    nc = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                            strategy="march", compact=False)
    cp = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                            strategy="march", compact=True,
                            compact_capacity=32 * 64)
    r1 = nc(params, rays, None, occ)
    r2 = cp(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(r1.rgb), np.asarray(r2.rgb), atol=2e-5)


def test_compacted_shade_matches_masked_composite():
    """compacted_shade (sort-compact + segmented compositing) must equal
    composite(mask=...) of a direct full-batch field eval when capacity
    covers every kept sample."""
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    B, S = 4, 16
    pos = jnp.asarray(rng.uniform(-1, 1, (B, S, 3)), jnp.float32)
    view = jnp.asarray(rng.uniform(0, 3, (B, 2)), jnp.float32)
    t = jnp.asarray(np.sort(rng.uniform(0.1, 3.0, (B, S)), axis=1), jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.01, 0.1, (B, S)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, S)) < 0.4)
    out = compacted_shade(field, params, pos, view, t, deltas, mask,
                          capacity=B * S, white_background=True)
    rgb_d, sig_d = field.apply(params, pos, view[:, None, :])
    ref = composite(rgb_d, sig_d, deltas, t_mid=t, mask=mask,
                    white_background=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-5)


def test_compaction_overflow_drops_not_corrupts():
    """Kept samples beyond capacity are dropped first-K-win in flat
    (ray-major) order: the result must equal compositing with the mask
    truncated to the first `cap` kept slots."""
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    B, S, cap = 2, 8, 5
    pos = jnp.asarray(rng.uniform(-1, 1, (B, S, 3)), jnp.float32)
    view = jnp.zeros((B, 2))
    t = jnp.asarray(np.sort(rng.uniform(0.1, 3.0, (B, S)), axis=1), jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.01, 0.1, (B, S)), jnp.float32)
    mask = jnp.ones((B, S), bool)  # 16 wanted, capacity 5
    out = compacted_shade(field, params, pos, view, t, deltas, mask,
                          capacity=cap, white_background=False)
    trunc = jnp.arange(B * S).reshape(B, S) < cap  # first 5 flat slots
    rgb_d, sig_d = field.apply(params, pos, view[:, None, :])
    ref = composite(rgb_d, sig_d, deltas, t_mid=t, mask=mask & trunc,
                    white_background=False)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc), atol=2e-5)


def test_ray_compaction_matches_uncompacted():
    """render.ray_compact drops background rays before the field runs;
    outputs must match the uncompacted renderer exactly: kept rays shade
    identically, dropped rays composite to pure background either way."""
    res = 32
    cfg = Config().apply_overrides([
        f"grid.resolution={res}", "sampler.samples_per_ray=32",
        "sampler.near=0.05", "scene.scene_scale=1.0",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "sampler.tighten_res=16", "sampler.occupancy_mask_res=16",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(31)
    # a small occupied blob -> many rays miss entirely
    occ = np.zeros((res, res, res), bool)
    occ[12:20, 12:20, 12:20] = True
    occ = jnp.asarray(occ)
    o = rng.uniform(-1, 1, (96, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = d + rng.normal(0, 0.25, d.shape)  # some rays miss the blob
    d = jnp.asarray(d, jnp.float32)
    rays = Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))

    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="march", compact=False)
    base = rend(params, rays, None, occ)

    cfg_rc = cfg.apply_overrides(["render.ray_compact=true",
                                  "render.ray_compact_fraction=0.9"])
    rend_rc = make_grid_renderer(field, cfg_rc.grid, cfg_rc.sampler,
                                 cfg_rc.render, strategy="march", compact=False)
    out = rend_rc(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(base.rgb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(base.acc),
                               atol=1e-5)

    # overflow: capacity below the kept count -> excess rays become
    # background (acc == 0), never corrupted
    cfg_of = cfg.apply_overrides(["render.ray_compact=true",
                                  "render.ray_compact_fraction=0.05"])
    rend_of = make_grid_renderer(field, cfg_of.grid, cfg_of.sampler,
                                 cfg_of.render, strategy="march", compact=False)
    out_of = rend_of(params, rays, None, occ)
    dropped = np.asarray(out_of.acc) == 0.0
    kept = ~dropped
    np.testing.assert_allclose(np.asarray(out_of.rgb)[kept],
                               np.asarray(base.rgb)[kept], atol=1e-5)
    bg = 1.0 if cfg.render.white_background else 0.0
    np.testing.assert_allclose(np.asarray(out_of.rgb)[dropped], bg, atol=1e-6)


def test_render_image_chunk_interleave_invariant(setup):
    """render_image output must not depend on the chunk size (the strided
    interleave + inverse must be exact)."""
    from tnerf.cameras import camera_rays
    from tnerf.render.renderer import render_image

    cfg, field, params, _ = setup
    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="march", compact=False)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 3.0
    rays = camera_rays(jnp.asarray(pose), 24, 16, 20.0, 1.0)
    occ = jnp.ones((8, 8, 8), bool)
    one = render_image(rend, params, rays, chunk_size=24 * 16, occupancy=occ)
    many = render_image(rend, params, rays, chunk_size=64, occupancy=occ)
    np.testing.assert_allclose(np.asarray(many.rgb), np.asarray(one.rgb),
                               atol=1e-6)


def test_kernel_path_with_fine_mask_refinement():
    """tighten_res pooled (kernel) + occupancy_mask_res finer (XLA
    refinement): must equal the pure-XLA composition of pooled tighten +
    fine mask."""
    res = 32
    cfg = Config().apply_overrides([
        f"grid.resolution={res}", "sampler.samples_per_ray=32",
        "sampler.near=0.05", "scene.scene_scale=1.0",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "sampler.tighten_res=16", "sampler.occupancy_mask_res=0",  # fine
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(53)
    occ = jnp.asarray(rng.uniform(0, 1, (res, res, res)) < 0.08)
    o = rng.uniform(-1, 1, (64, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    rays = Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))

    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="march", compact=False)
    out = rend(params, rays, None, occ)

    # manual XLA composition of the same semantics
    from tnerf.grid.traversal import (
        make_coarse_occupancy, march_samples_t, occupancy_lookup, ray_aabb,
        tightened_range,
    )
    from tnerf.render.composite import composite
    from tnerf.sampling import sample_positions

    te, tx = ray_aabb(rays.origins, rays.directions, cfg.grid.aabb_min,
                      cfg.grid.aabb_max)
    te = jnp.maximum(te, cfg.sampler.near)
    tx = jnp.maximum(tx, te)
    occ16 = make_coarse_occupancy(occ, 2)
    t0, t1 = tightened_range(rays.origins, rays.directions, te, tx, occ16,
                             cfg.grid, probes=cfg.sampler.tighten_probes)
    t, deltas = march_samples_t(t0, t1, 32)
    pts = sample_positions(rays.origins, rays.directions, t)
    m = (t1[:, None] > t0[:, None]) & occupancy_lookup(pts, occ16, cfg.grid)
    m = m & occupancy_lookup(pts, occ, cfg.grid)
    rgb, sigma = field.apply(params, pts, rays.viewdirs_tp[..., None, :])
    ref = composite(rgb, sigma, deltas, t_mid=t, mask=m,
                    white_background=cfg.render.white_background)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=3e-4)


def test_ray_keep_fraction_mirrors_keep_rule():
    """ray_keep_fraction (the eval capacity guard) must reflect how many
    rays the compaction keep rule retains: all-empty occupancy -> 0,
    all-full -> 1, a blob -> strictly between, and more rays kept when
    the grid fattens (the trained-EMA-vs-analytic footgun it exists
    for)."""
    from tnerf.render.grid_renderer import ray_keep_fraction

    res = 32
    cfg = Config().apply_overrides([
        f"grid.resolution={res}", "sampler.samples_per_ray=32",
        "sampler.near=0.05", "scene.scene_scale=1.0",
        "sampler.tighten_res=16",
    ])
    rng = np.random.default_rng(5)
    o = rng.uniform(-1, 1, (128, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = jnp.asarray(d + rng.normal(0, 0.3, d.shape), jnp.float32)
    rays = Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))

    empty = jnp.zeros((res, res, res), bool)
    full = jnp.ones((res, res, res), bool)
    blob = jnp.asarray(np.pad(np.ones((6, 6, 6), bool),
                              ((13, 13), (13, 13), (13, 13))))
    fat = jnp.asarray(np.pad(np.ones((14, 14, 14), bool),
                             ((9, 9), (9, 9), (9, 9))))
    k_empty = ray_keep_fraction(rays, empty, cfg.grid, cfg.sampler)
    k_blob = ray_keep_fraction(rays, blob, cfg.grid, cfg.sampler)
    k_fat = ray_keep_fraction(rays, fat, cfg.grid, cfg.sampler)
    k_full = ray_keep_fraction(rays, full, cfg.grid, cfg.sampler)
    # full occupancy keeps exactly the rays that intersect the AABB
    from tnerf.grid.traversal import ray_aabb
    te, tx = ray_aabb(rays.origins, rays.directions,
                      cfg.grid.aabb_min, cfg.grid.aabb_max)
    te = jnp.maximum(te, cfg.sampler.near)
    hit_frac = float((tx > te).mean())
    assert k_empty == 0.0
    assert abs(k_full - hit_frac) < 1e-6
    assert 0.0 < k_blob < k_fat < k_full


def test_ray_compact_guard_res_is_pipeline_aware():
    """The cli capacity guard must probe at the POOLING the active
    pipeline's keep rule uses — fused pools at the kernel's
    min(render.fused_coarse_res, res) regardless of sampler.tighten_res;
    march pools at tighten_res but only on the kernel-eligible configs;
    pipelines that never compact get no guard (a spurious warning trains
    users to ignore the real one)."""
    from tnerf.cli import _ray_compact_guard

    base = [
        "grid.resolution=64", "render.ray_compact=true",
        "sampler.tighten=true", "sampler.tighten_res=32",
        "sampler.occupancy_mask_res=0",
    ]
    mk = lambda *ov: Config().apply_overrides(base + list(ov))

    # fused: the kernel's res_c = min(fused_coarse_res, res), not tighten_res
    assert _ray_compact_guard(mk("render.pipeline=fused")) == (True, 32)
    assert _ray_compact_guard(
        mk("render.pipeline=fused", "render.fused_coarse_res=16")
    ) == (True, 16)
    # fused without tighten never compacts
    assert _ray_compact_guard(
        mk("render.pipeline=fused", "render.fused_tighten=false"))[0] is False
    # march on the kernel-eligible config: eligible, NO pool override —
    # ray_keep_fraction derives the march pooling and the CDF-fold
    # probe count itself (an explicit pool_res would suppress both)
    assert _ray_compact_guard(mk("render.pipeline=grid_march")) == (True, None)
    # march without tighten never takes the compacted path
    assert _ray_compact_guard(
        mk("render.pipeline=grid_march", "sampler.tighten=false"))[0] is False
    # march with a fine tighten_res (kernel ineligible, t_res > 32)
    assert _ray_compact_guard(
        mk("render.pipeline=grid_march", "sampler.tighten_res=64"))[0] is False
    # ray_compact off: no guard for any pipeline
    assert _ray_compact_guard(
        mk("render.pipeline=fused", "render.ray_compact=false"))[0] is False


def test_ray_keep_fraction_pool_res_override():
    """pool_res must override sampler.tighten_res (the fused guard
    probes at 16 even when the march config says 32): coarser pooling
    keeps at least as many rays."""
    from tnerf.render.grid_renderer import ray_keep_fraction

    res = 32
    cfg = Config().apply_overrides([
        f"grid.resolution={res}", "sampler.samples_per_ray=32",
        "sampler.near=0.05", "scene.scene_scale=1.0",
        "sampler.tighten_res=32",
    ])
    rng = np.random.default_rng(7)
    o = rng.uniform(-1, 1, (96, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = jnp.asarray(d + rng.normal(0, 0.3, d.shape), jnp.float32)
    rays = Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))
    blob = jnp.asarray(np.pad(np.ones((5, 5, 5), bool),
                              ((2, 25), (13, 14), (13, 14))))
    k_fine = ray_keep_fraction(rays, blob, cfg.grid, cfg.sampler)
    k_8 = ray_keep_fraction(rays, blob, cfg.grid, cfg.sampler, pool_res=8)
    k_explicit = ray_keep_fraction(rays, blob, cfg.grid, cfg.sampler,
                                   pool_res=32)
    assert k_8 >= k_fine          # coarser pooling is a superset rule
    assert k_explicit == k_fine   # explicit == configured resolution
    assert 0.0 < k_fine < 1.0


def test_intervals_rejects_cdf_placement():
    """grid_intervals samples per cell interval; a CDF placement knob
    must raise at construction, not be silently ignored (quadrature
    contract)."""
    import dataclasses

    import pytest as _pytest

    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        "grid.resolution=8", "field_.hidden_width=16",
        "field_.hidden_layers=1", "field_.n_frequencies=2",
        "sampler.placement=occupancy_cdf",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    with _pytest.raises(ValueError, match="grid_march pipeline only"):
        make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                           strategy="intervals")


def test_cdf_keep_rule_probes_bin_midpoints():
    """Under CDF placement the kernel's ray-compaction keep rule probes
    the cdf_bins midpoints (the positions placement distributes over),
    not the S sample midpoints: with few samples and a thin occupied
    slab sitting between consecutive S-probe midpoints, an S-probe keep
    rule would drop rays the placement would have put supported samples
    on (regression: round-3 self-review findings 2+3).

    Checks BOTH sides of the shared-semantics contract: the renderer
    keeps the geometry (non-background pixels survive ray compaction)
    and the ray_keep_fraction guard mirror reports the same keep rule."""
    from tnerf.grid.occupancy import OccupancyGridState, renderer_payload
    from tnerf.render.grid_renderer import ray_keep_fraction

    res = 32
    base = [
        f"grid.resolution={res}", "scene.scene_scale=1.0",
        "sampler.near=0.05", "sampler.tighten=true",
        "sampler.tighten_res=16", "sampler.occupancy_mask_res=16",
        # S=4 probes of a [2.0, 4.0] span miss a 1-fine-cell slab;
        # 64 bins do not
        "sampler.samples_per_ray=4", "sampler.cdf_bins=64",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "render.ray_compact=true", "render.ray_compact_fraction=1.0",
        "render.compact=false",
    ]
    # one-fine-cell-thick z-slab at the AABB center: occupies z cell 16
    # of 32 => pooled 16^3 cell 8; span [-1.5, 1.5] at z in [-0.046, 0)
    dens = np.zeros((res, res, res), np.float32)
    dens[:, :, 15] = 50.0
    occ3 = jnp.asarray(dens > 0.0)
    rays = Rays(
        origins=jnp.asarray(np.array([[0.2, 0.1, -3.0]], np.float32)),
        directions=jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32)),
        viewdirs_tp=viewdirs_to_thetaphi(
            jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
        ),
    )
    for placement, payload in (
        ("occupancy_cdf", occ3),
        ("density_cdf", jnp.asarray(dens)),
    ):
        cfg = Config().apply_overrides(
            base + [f"sampler.placement={placement}"]
        )
        # guard mirror: the single slab-crossing ray must be KEPT
        kf = ray_keep_fraction(
            rays,
            payload if placement == "occupancy_cdf" else occ3,
            cfg.grid, cfg.sampler,
        )
        assert kf == 1.0, (placement, kf)
        # renderer: the compacted render of the same ray must see the
        # slab (nonzero opacity), not drop it to background
        field = NeRFField(cfg.field_, cfg.grid)
        params = field.init(jax.random.PRNGKey(0))
        render = make_grid_renderer(
            field, cfg.grid, cfg.sampler, cfg.render, strategy="march",
        )
        acc = float(render(params, rays, None, payload).acc[0])
        assert acc > 0.0, (placement, acc)
