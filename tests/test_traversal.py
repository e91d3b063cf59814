"""Grid-traversal tests vs a brute-force per-cell slab-test oracle — the
reference's own intersection math (optixPrograms.cu:143-156) applied to
every cell AABB independently (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tnerf.config import GridConfig
from tnerf.grid.occupancy import init_occupancy
from tnerf.grid.traversal import (
    march_samples_t,
    occupancy_lookup,
    ray_aabb,
    traverse_grid,
)


def brute_force_intervals(o, d, grid: GridConfig):
    """Oracle: slab-test the ray against every cell AABB (reference
    optixPrograms.cu:143-156 math), keep positive-length hits, sort by t."""
    res = grid.resolution
    lo = np.asarray(grid.aabb_min)
    hi = np.asarray(grid.aabb_max)
    h = (hi - lo) / res
    out = []
    for i in range(res):
        for j in range(res):
            for k in range(res):
                cmin = lo + h * np.array([i, j, k])
                cmax = cmin + h
                invd = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
                t0 = (cmin - o) * invd
                t1 = (cmax - o) * invd
                te = np.max(np.minimum(t0, t1))
                tx = np.min(np.maximum(t0, t1))
                te = max(te, 0.0)
                if tx > te + 1e-7:
                    out.append((te, tx, (i * res + j) * res + k))
    out.sort()
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("res", [4, 8])
def test_traversal_matches_bruteforce_oracle(seed, res):
    grid = GridConfig(resolution=res)
    rng = np.random.default_rng(seed)
    n_rays = 16
    # rays from outside the box aimed near the center, plus some that miss
    o = rng.uniform(-3, 3, (n_rays, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    target = rng.uniform(-1.2, 1.2, (n_rays, 3))
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    iv = traverse_grid(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), grid)
    for r in range(n_rays):
        oracle = brute_force_intervals(o[r], d[r], grid)
        got_mask = np.asarray(iv.mask[r])
        got = [
            (float(iv.t_starts[r, s]), float(iv.t_ends[r, s]), int(iv.cells[r, s]))
            for s in range(got_mask.shape[0])
            if got_mask[s]
        ]
        assert len(got) == len(oracle), (r, len(got), len(oracle))
        for (gs, ge, gc), (os_, oe, oc) in zip(got, oracle):
            assert gc == oc, (r, got, oracle)
            np.testing.assert_allclose([gs, ge], [os_, oe], atol=2e-4)


def test_traversal_intervals_are_contiguous_and_sorted():
    grid = GridConfig(resolution=8)
    o = jnp.asarray([[-2.0, 0.05, 0.1]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    iv = traverse_grid(o, d, grid)
    m = np.asarray(iv.mask[0])
    ts = np.asarray(iv.t_starts[0])[m]
    te = np.asarray(iv.t_ends[0])[m]
    assert m.sum() == 8  # axis-aligned ray crosses exactly res cells
    np.testing.assert_allclose(ts[1:], te[:-1], atol=1e-5)  # contiguous
    assert np.all(np.diff(ts) > 0)  # sorted (ray order)


def test_ray_missing_box_has_no_hits():
    grid = GridConfig(resolution=8)
    o = jnp.asarray([[5.0, 5.0, 5.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])  # pointing away
    iv = traverse_grid(o, d, grid)
    assert not bool(np.asarray(iv.mask).any())


def test_origin_inside_box_starts_at_zero():
    grid = GridConfig(resolution=8)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.577, 0.577, 0.577]])
    iv = traverse_grid(o, d, grid)
    m = np.asarray(iv.mask[0])
    assert m.any()
    assert abs(float(np.asarray(iv.t_starts[0])[m][0])) < 1e-6


def test_occupancy_masking_prunes_cells():
    grid = GridConfig(resolution=4)
    occ = jnp.zeros((4, 4, 4), bool).at[2, 2, 2].set(True)
    o = jnp.asarray([[-2.0, 0.3, 0.3]])  # crosses row j where y=0.3 -> cell 2
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    iv = traverse_grid(o, d, grid, occupancy=occ)
    m = np.asarray(iv.mask[0])
    assert m.sum() == 1
    assert int(np.asarray(iv.cells[0])[m][0]) == (2 * 4 + 2) * 4 + 2


def test_capacity_truncation():
    grid = GridConfig(resolution=8)
    o = jnp.asarray([[-2.0, -1.9, -1.95]]) * 0.9
    d = jnp.asarray([[1.0, 0.95, 0.97]])
    d = d / jnp.linalg.norm(d)
    iv = traverse_grid(o, d, grid, max_hits=4)
    assert iv.t_starts.shape[-1] == 4
    m = np.asarray(iv.mask[0])
    # truncated but the kept ones are the first along the ray
    ts = np.asarray(iv.t_starts[0])[m]
    assert np.all(np.diff(ts) > 0)


def test_march_samples_and_lookup():
    grid = GridConfig(resolution=8)
    o = jnp.asarray([[-2.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    te, tx = ray_aabb(o, d, grid.aabb_min, grid.aabb_max)
    np.testing.assert_allclose(float(te[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(tx[0]), 3.0, atol=1e-6)
    t, dt = march_samples_t(te, tx, 16)
    assert t.shape == (1, 16)
    np.testing.assert_allclose(np.asarray(dt), 2.0 / 16, atol=1e-6)
    assert float(t[0, 0]) > 1.0 and float(t[0, -1]) < 3.0
    st = init_occupancy(grid)
    pts = o + d * t[..., None]
    inside = occupancy_lookup(pts, st.bitfield, grid)
    assert bool(np.asarray(inside).all())
    outside = occupancy_lookup(jnp.asarray([[9.0, 0.0, 0.0]]), st.bitfield, grid)
    assert not bool(np.asarray(outside)[0])


def test_tightened_range_concentrates_on_occupied_span():
    from tnerf.grid.traversal import tightened_range

    grid = GridConfig(resolution=16)
    # occupancy: only the slab x in [cell 8, cell 9] is occupied
    occ = jnp.zeros((16, 16, 16), bool).at[8:10].set(True)
    o = jnp.asarray([[-3.0, 0.01, 0.01], [-3.0, 5.0, 0.0]])  # 2nd misses box
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    te, tx = ray_aabb(o, d, grid.aabb_min, grid.aabb_max)
    te = jnp.maximum(te, 0.0)
    tx = jnp.maximum(tx, te)
    t0, t1 = tightened_range(o, d, te, tx, occ, grid, probes=64)
    # occupied span: x in [0, 0.25] -> t in [3.0, 3.25]; padded ~one cell
    assert 2.7 < float(t0[0]) < 3.01
    assert 3.24 < float(t1[0]) < 3.6
    # miss ray: empty range
    assert float(t1[1]) <= float(t0[1]) + 1e-6


def test_tightened_march_renders_same_as_full_range():
    """Quadrature over the tightened range must match full-range sampling
    (denser samples, same geometry) for a field supported on occupancy."""
    import jax

    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
        "sampler.samples_per_ray=256", "grid.resolution=8",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    occ = jnp.zeros((8, 8, 8), bool).at[2:6, 2:6, 2:6].set(True)
    rng = np.random.default_rng(3)
    oo = rng.uniform(-1, 1, (64, 3))
    oo = oo / np.linalg.norm(oo, axis=-1, keepdims=True) * 2.5
    dd = -oo / np.linalg.norm(oo, axis=-1, keepdims=True)
    rays = Rays(jnp.asarray(oo, jnp.float32), jnp.asarray(dd, jnp.float32),
                viewdirs_to_thetaphi(jnp.asarray(dd, jnp.float32)))
    r_tight = make_grid_renderer(field, cfg.grid,
                                 cfg.sampler, cfg.render, strategy="march",
                                 compact=False)(params, rays, None, occ)
    cfg2 = cfg.apply_overrides(["sampler.tighten=false"])
    r_full = make_grid_renderer(field, cfg2.grid,
                                cfg2.sampler, cfg2.render, strategy="march",
                                compact=False)(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(r_tight.rgb), np.asarray(r_full.rgb),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(r_tight.acc), np.asarray(r_full.acc),
                               atol=0.02)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("res,factor", [(16, 4), (32, 8)])
def test_twolevel_matches_flat_traversal(seed, res, factor):
    """traverse_grid_twolevel must emit exactly the occupied-cell interval
    set of the flat occupancy-masked walk (same cells, same t's, same
    order), only skipping coarse-empty space faster."""
    from tnerf.grid.traversal import traverse_grid_twolevel

    grid = GridConfig(resolution=res)
    rng = np.random.default_rng(seed)
    n_rays = 48
    o = rng.uniform(-3, 3, (n_rays, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    target = rng.uniform(-1.2, 1.2, (n_rays, 3))
    d = target - o
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    o = o.astype(np.float32)

    occ = rng.uniform(0, 1, (res, res, res)) < 0.08

    flat = traverse_grid(
        jnp.asarray(o), jnp.asarray(d), grid, occupancy=jnp.asarray(occ),
        max_hits=3 * res,
    )
    two = traverse_grid_twolevel(
        jnp.asarray(o), jnp.asarray(d), grid, jnp.asarray(occ),
        coarse_factor=factor, max_hits=3 * res,
    )
    for r in range(n_rays):
        fm = np.asarray(flat.mask[r])
        tm = np.asarray(two.mask[r])
        f_cells = np.asarray(flat.cells[r])[fm]
        t_cells = np.asarray(two.cells[r])[tm]
        np.testing.assert_array_equal(f_cells, t_cells)
        np.testing.assert_allclose(
            np.asarray(flat.t_starts[r])[fm], np.asarray(two.t_starts[r])[tm],
            atol=3e-4,
        )
        np.testing.assert_allclose(
            np.asarray(flat.t_ends[r])[fm], np.asarray(two.t_ends[r])[tm],
            atol=3e-4,
        )


def test_twolevel_skips_in_fewer_steps():
    """With a single occupied corner, the two-level walk must cover the
    grid within a small step budget (coarse jumps), where the flat walk
    would need 3*res steps."""
    from tnerf.grid.traversal import traverse_grid_twolevel

    res = 64
    grid = GridConfig(resolution=res)
    occ = np.zeros((res, res, res), bool)
    occ[-8:, -8:, -8:] = True  # one occupied coarse cell at the far corner
    # diagonal ray from the near corner
    o = jnp.asarray([[-2.0, -2.0, -2.0]], jnp.float32)
    d = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32) / np.sqrt(3.0)
    two = traverse_grid_twolevel(
        o, d, grid, jnp.asarray(occ), coarse_factor=8,
        max_hits=64, steps=40,  # << 3*64=192 the flat walk would need
    )
    cells = np.asarray(two.cells[0])[np.asarray(two.mask[0])]
    assert len(cells) >= 8  # walked the occupied corner's diagonal cells
    flat_ids = np.asarray(np.nonzero(occ.reshape(-1))[0])
    assert np.all(np.isin(cells, flat_ids))


def test_occupancy_lookup_matmul_matches_gather():
    """The MXU one-hot matmul reformulation (byte-packed table fetch,
    occupancy_lookup_matmul) must be bit-identical to the plain gather —
    same floor/clip arithmetic, exact byte copies through bf16 (values
    0..255 are exact). Exercises both the even-chunk and padded paths,
    points outside the AABB, and a res whose bit count needs row padding."""
    from tnerf.grid.traversal import occupancy_lookup_matmul

    rng = np.random.default_rng(7)
    for res, n_pts, chunk in ((64, 5000, 2048), (32, 1000, 1000)):
        grid = GridConfig(resolution=res)
        occ = jnp.asarray(rng.random((res, res, res)) < 0.3)
        pts = jnp.asarray(
            rng.uniform(-1.6, 1.6, size=(n_pts, 3)).astype(np.float32)
        )  # AABB is [-1.5, 1.5]: ~7% of points land outside
        ref = np.asarray(occupancy_lookup(pts, occ, grid))
        got = np.asarray(occupancy_lookup_matmul(pts, occ, grid, chunk=chunk))
        assert ref.dtype == got.dtype == np.bool_
        np.testing.assert_array_equal(got, ref)
    # batched shape passthrough
    grid = GridConfig(resolution=32)
    occ = jnp.asarray(rng.random((32, 32, 32)) < 0.5)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(4, 7, 3)).astype(np.float32))
    out = occupancy_lookup_matmul(pts, occ, grid, chunk=16)
    assert out.shape == (4, 7)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(occupancy_lookup(pts, occ, grid))
    )


def test_density_lookup_matmul_matches_gather():
    """The one-hot VALUE matmul (density_lookup_matmul) must be
    bit-identical to the plain gather — a one-hot f32 row copies one
    value exactly.  Covers pooled CDF-probe resolutions (16, 32), a
    res needing row padding via non-multiple chunking, outside points
    (-> 0.0), and batched shape passthrough."""
    from tnerf.grid.traversal import density_lookup, density_lookup_matmul

    rng = np.random.default_rng(11)
    for res, n_pts, chunk in ((16, 5000, 2048), (32, 1000, 700)):
        grid = GridConfig(resolution=res)
        dens = jnp.asarray(
            (rng.random((res, res, res)) * 50).astype(np.float32)
        )
        pts = jnp.asarray(
            rng.uniform(-1.6, 1.6, size=(n_pts, 3)).astype(np.float32)
        )
        ref = np.asarray(density_lookup(pts, dens, grid))
        got = np.asarray(density_lookup_matmul(pts, dens, grid, chunk=chunk))
        assert ref.dtype == got.dtype == np.float32
        np.testing.assert_array_equal(got, ref)
        # outside points are exactly zero
        far = jnp.asarray(np.full((8, 3), 9.0, np.float32))
        np.testing.assert_array_equal(
            np.asarray(density_lookup_matmul(far, dens, grid)), 0.0
        )
    grid = GridConfig(resolution=16)
    dens = jnp.asarray((rng.random((16, 16, 16)) * 5).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1.0, 1.0, size=(3, 5, 3)).astype(np.float32))
    out = density_lookup_matmul(pts, dens, grid, chunk=8)
    assert out.shape == (3, 5)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(density_lookup(pts, dens, grid))
    )
