"""Pallas DDA traversal kernel parity (interpret mode, SURVEY §4 kernel
strategy): must emit exactly the interval set of the oracle-tested scan
walk, dense and with coarse-skip occupancy."""

import numpy as np
import pytest

import jax.numpy as jnp

from tnerf.config import GridConfig
from tnerf.grid.pallas_dda import pack_coarse_words, traverse_grid_pallas
from tnerf.grid.traversal import make_coarse_occupancy, traverse_grid


def _rays(B, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    t = rng.uniform(-1.2, 1.2, (B, 3))
    d = t - o
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o.astype(np.float32)), jnp.asarray(d)


def _assert_interval_parity(ref, got, B, atol=3e-4):
    for b in range(B):
        rm = np.asarray(ref.mask[b])
        gm = np.asarray(got.mask[b])
        rc = np.asarray(ref.cells[b])[rm]
        gc = np.asarray(got.cells[b])[gm]
        np.testing.assert_array_equal(rc, gc)
        np.testing.assert_allclose(
            np.asarray(ref.t_starts[b])[rm], np.asarray(got.t_starts[b])[gm],
            atol=atol,
        )
        np.testing.assert_allclose(
            np.asarray(ref.t_ends[b])[rm], np.asarray(got.t_ends[b])[gm],
            atol=atol,
        )


def test_dense_parity_with_scan_walk():
    B = 300  # pads to 1024 internally: padding path covered
    o, d = _rays(B)
    grid = GridConfig(resolution=16)
    ref = traverse_grid(o, d, grid, max_hits=48)
    got = traverse_grid_pallas(o, d, grid, max_hits=48, interpret=True)
    _assert_interval_parity(ref, got, B)


@pytest.mark.parametrize("res,factor", [(16, 4), (32, 8)])
def test_occupancy_parity_with_scan_walk(res, factor):
    B = 300
    o, d = _rays(B, seed=1)
    grid = GridConfig(resolution=res)
    rng = np.random.default_rng(2)
    occ = jnp.asarray(rng.uniform(0, 1, (res, res, res)) < 0.08)
    ref = traverse_grid(o, d, grid, occupancy=occ, max_hits=3 * res)
    got = traverse_grid_pallas(
        o, d, grid, occ, coarse_factor=factor, max_hits=3 * res, interpret=True
    )
    _assert_interval_parity(ref, got, B)


def test_pack_coarse_words_bits():
    rng = np.random.default_rng(3)
    occ = rng.uniform(0, 1, (16, 16, 16)) < 0.3
    words = np.asarray(pack_coarse_words(jnp.asarray(occ)))
    assert words.shape == (8, 128)
    flat = occ.reshape(-1)
    for c in rng.integers(0, 4096, 64):
        assert ((words[0, c >> 5] >> (c & 31)) & 1) == int(flat[c])


def test_capacity_truncation_and_padding():
    o, d = _rays(64, seed=4)
    grid = GridConfig(resolution=16)
    # H > steps: padded with invalid slots
    got = traverse_grid_pallas(o, d, grid, max_hits=64, steps=48, interpret=True)
    assert got.cells.shape[-1] == 64
    assert not np.asarray(got.mask[:, 48:]).any()
    # H < steps: truncated
    got2 = traverse_grid_pallas(o, d, grid, max_hits=10, steps=48, interpret=True)
    assert got2.cells.shape[-1] == 10


@pytest.mark.parametrize("res_c", [16, 32])
def test_tighten_range_pallas_brackets_occupied_span(res_c):
    """The Pallas probe-tightening kernel must bracket the occupied span
    (padded) and keep the full span for rays with no occupied probe —
    at both the one-row (16^3) and row-selected (32^3) bitfields."""
    from tnerf.config import GridConfig
    from tnerf.grid.pallas_dda import pack_words_rows, tighten_range_pallas
    from tnerf.grid.traversal import make_coarse_occupancy, ray_aabb

    res = 64
    grid = GridConfig(resolution=res, aabb_min=(-1.0, -1.0, -1.0),
                      aabb_max=(1.0, 1.0, 1.0))
    occ = np.zeros((res, res, res), bool)
    occ[28:36, 28:36, 28:36] = True  # central blob, x,y,z in [-0.125, 0.125]
    occ_c = make_coarse_occupancy(jnp.asarray(occ), res // res_c)
    words = pack_words_rows(occ_c)

    # ray through the center hits; a ray offset far in +y misses
    origins = jnp.asarray([[-3.0, 0.0, 0.0], [-3.0, 0.9, 0.0]], jnp.float32)
    directions = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    te, tx = ray_aabb(origins, directions, grid.aabb_min, grid.aabb_max)
    t0, t1 = tighten_range_pallas(
        origins, directions, te, tx, words, res_c, grid, interpret=True
    )
    t0, t1 = np.asarray(t0), np.asarray(t1)
    # hit ray: occupied span is x in [-0.125, 0.125] -> t in [2.875, 3.125];
    # coarse cells are 0.125 wide so the coarse span adds <= 1 cell each side,
    # plus pad (probe step + fine diag). Must bracket, must tighten.
    assert t0[0] < 2.875 and t1[0] > 3.125
    assert t0[0] > float(te[0]) + 0.5 and t1[0] < float(tx[0]) - 0.5
    # miss ray: untouched full span
    np.testing.assert_allclose(t0[1], float(te[1]), rtol=1e-6)
    np.testing.assert_allclose(t1[1], float(tx[1]), rtol=1e-6)


def test_truncated_walk_last_interval_ends_at_cell_exit():
    """When the step budget truncates the walk, the final interval must
    end at that cell's true exit — not stretch to t_exit across space the
    walk never visited (review finding: delta was ~12x the cell width)."""
    from tnerf.config import GridConfig
    from tnerf.grid.pallas_dda import traverse_grid_pallas
    from tnerf.grid.traversal import traverse_grid

    grid = GridConfig(resolution=16, aabb_min=(-1.0, -1.0, -1.0),
                      aabb_max=(1.0, 1.0, 1.0))
    o = jnp.asarray([[-3.0, 0.01, 0.02]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    got = traverse_grid_pallas(o, d, grid, steps=5, max_hits=5, interpret=True)
    want = traverse_grid(o, d, grid, max_hits=5)
    np.testing.assert_allclose(
        np.asarray(got.t_ends[0]), np.asarray(want.t_ends[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.t_starts[0]), np.asarray(want.t_starts[0]), atol=1e-5
    )


def test_pack_words_rows_bits():
    rng = np.random.default_rng(11)
    for c in (16, 32):
        occ = rng.uniform(0, 1, (c, c, c)) < 0.3
        words = np.asarray(
            __import__("tnerf.grid.pallas_dda", fromlist=["pack_words_rows"])
            .pack_words_rows(jnp.asarray(occ))
        )
        flat = occ.reshape(-1)
        for i in rng.integers(0, c ** 3, 200):
            w = i // 32
            bit = (words[w >> 7, w & 127] >> (i % 32)) & 1
            assert bool(bit) == bool(flat[i]), (c, i)


@pytest.mark.parametrize("res_c", [16, 32])
def test_tighten_sample_mask_matches_xla_path(res_c):
    """The fused tighten+mask kernel must reproduce the XLA composition
    (tightened_range on the pooled grid + occupancy_lookup at the
    midpoint samples) exactly."""
    from tnerf.grid.pallas_dda import tighten_sample_mask_pallas
    from tnerf.grid.traversal import (
        march_samples_t, occupancy_lookup, ray_aabb, tightened_range,
    )
    from tnerf.sampling import sample_positions

    res = 64
    grid = GridConfig(resolution=res)
    rng = np.random.default_rng(17)
    occ = rng.uniform(0, 1, (res, res, res)) < 0.04
    occ_c = make_coarse_occupancy(jnp.asarray(occ), res // res_c)

    B, S, P = 256, 48, 64
    o = rng.uniform(-1, 1, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d += rng.normal(0, 0.08, d.shape)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    te, tx = ray_aabb(o, d, grid.aabb_min, grid.aabb_max)
    te = jnp.maximum(te, 0.05)
    tx = jnp.maximum(tx, te)

    t0_k, t1_k, mask_k = tighten_sample_mask_pallas(
        o, d, te, tx, occ_c, S, grid, probes=P, interpret=True
    )
    t0_x, t1_x = tightened_range(o, d, te, tx, occ_c, grid, probes=P)
    np.testing.assert_allclose(np.asarray(t0_k), np.asarray(t0_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1_k), np.asarray(t1_x), atol=1e-5)

    t, _ = march_samples_t(t0_x, t1_x, S)
    mask_x = (t1_x[:, None] > t0_x[:, None]) & occupancy_lookup(
        sample_positions(o, d, t), occ_c, grid
    )
    agree = np.asarray(mask_k) == np.asarray(mask_x)
    # o + d*t is FMA-fused inside the kernel but not (necessarily) in the
    # outer XLA program -> 1-ulp position differences flip the bit for
    # samples landing exactly on coarse-cell boundaries (~0.3% here,
    # physically meaningless: the field is continuous there).  Require
    # agreement everywhere except such boundary ties.
    assert agree.mean() > 0.99, agree.mean()
    if not agree.all():
        bad = np.argwhere(~agree)
        t, _ = march_samples_t(t0_x, t1_x, S)
        pts = np.asarray(sample_positions(o, d, t))
        cell = (pts[bad[:, 0], bad[:, 1]] + 1.0) / (2.0 / res_c)
        dist = np.abs(cell - np.rint(cell)).min(axis=1)
        assert dist.max() < 1e-4, dist.max()  # all flips at boundaries


def test_march_renderer_kernel_mask_path_matches_xla(monkeypatch):
    """make_grid_renderer with pooled tighten/mask res: the eval-time
    kernel path (key=None) must match the same renderer routed through
    the XLA composition of identical pooled semantics."""
    import jax

    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer
    from tnerf.grid.traversal import (
        march_samples_t, occupancy_lookup, tightened_range,
    )
    from tnerf.sampling import sample_positions

    res = 32
    cfg = Config().apply_overrides([
        f"grid.resolution={res}", "sampler.samples_per_ray=32",
        "sampler.near=0.05", "scene.scene_scale=1.0",
        "sampler.tighten_res=16", "sampler.occupancy_mask_res=16",
        "sampler.tighten_probes=64",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(23)
    occ = jnp.asarray(rng.uniform(0, 1, (res, res, res)) < 0.1)

    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    o = rng.uniform(-1, 1, (64, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    rays = Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))

    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="march", compact=False)
    out_kernel = rend(params, rays, None, occ)

    # Same renderer with the kernel swapped for an XLA implementation of
    # the identical contract -> outputs must agree to float tolerance.
    import tnerf.render.grid_renderer as gr

    def xla_impl(origins, directions, te, tx, occ_c, S, grid, probes=256,
                 interpret=False):
        t0, t1 = tightened_range(origins, directions, te, tx, occ_c, grid,
                                 probes=probes)
        t, _ = march_samples_t(t0, t1, S)
        m = (t1[:, None] > t0[:, None]) & occupancy_lookup(
            sample_positions(origins, directions, t), occ_c, grid
        )
        return t0, t1, m

    monkeypatch.setattr(gr, "tighten_sample_mask_pallas", xla_impl)
    rend_x = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                                strategy="march", compact=False)
    out_x = rend_x(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(out_kernel.rgb),
                               np.asarray(out_x.rgb), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_kernel.acc),
                               np.asarray(out_x.acc), atol=2e-4)


def test_cdf_fold_kernel_mask_is_bin_support():
    """The CDF fold (make_grid_renderer fold_cdf) feeds the kernel's
    n_samples=cdf_bins midpoint mask to cdf placement as the per-bin
    weights/support.  That is only sound if the kernel mask equals the
    XLA bin probes cdf_bin_weights would have made on the same spans —
    same pooled grid, same bin midpoints (up to FMA 1-ulp boundary
    flips)."""
    from tnerf.grid.pallas_dda import tighten_sample_mask_pallas
    from tnerf.grid.traversal import ray_aabb
    from tnerf.render.grid_renderer import cdf_bin_weights
    from tnerf.config import Config

    res, t_res, P = 64, 16, 64
    grid = GridConfig(resolution=res)
    cfg = Config().apply_overrides([
        "grid.resolution=64", "sampler.cdf_bins=64",
        "sampler.occupancy_mask_res=16", "sampler.tighten_res=16",
        "sampler.placement=occupancy_cdf",
    ])
    rng = np.random.default_rng(23)
    occ = rng.uniform(0, 1, (res, res, res)) < 0.04
    occ_c = make_coarse_occupancy(jnp.asarray(occ), res // t_res)

    B = 256
    o = rng.uniform(-1, 1, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d += rng.normal(0, 0.08, d.shape)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    te, tx = ray_aabb(o, d, grid.aabb_min, grid.aabb_max)
    te = jnp.maximum(te, 0.05)
    tx = jnp.maximum(tx, te)

    t0, t1, mask_k = tighten_sample_mask_pallas(
        o, d, te, tx, occ_c, P, grid, probes=64, interpret=True
    )
    w, support = cdf_bin_weights(
        o, d, t0, t1, occ_c, None, cfg.grid, cfg.sampler
    )
    agree = np.asarray(mask_k) == np.asarray(support)
    assert agree.mean() > 0.99, agree.mean()
    np.testing.assert_array_equal(np.asarray(w) > 0, np.asarray(support))


@pytest.mark.parametrize("ray_compact", [False, True])
def test_march_renderer_cdf_fold_matches_xla(monkeypatch, ray_compact):
    """occupancy_cdf render through the folded kernel path equals the
    same renderer with the kernel swapped for an XLA mirror of the
    identical contract (tighten + n_samples midpoint bin mask) — the
    fold plumbing (pre-computed weights into cdf_place) is validated
    against an independent implementation, with and without ray
    compaction."""
    import jax

    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.grid.traversal import (
        march_samples_t, occupancy_lookup, ray_aabb, tightened_range,
    )
    from tnerf.render.grid_renderer import make_grid_renderer
    from tnerf.sampling import sample_positions
    import tnerf.render.grid_renderer as gr

    cfg = Config().apply_overrides([
        "grid.resolution=32", "sampler.tighten_res=16",
        "sampler.occupancy_mask_res=16", "sampler.samples_per_ray=24",
        "sampler.placement=occupancy_cdf", "sampler.cdf_bins=32",
        "sampler.near=0.05",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        f"render.ray_compact={'true' if ray_compact else 'false'}",
        "render.ray_compact_fraction=0.9",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    res = cfg.grid.resolution
    occ = np.zeros((res, res, res), bool)
    occ[10:22, 10:22, 12:20] = rng.uniform(0, 1, (12, 12, 8)) < 0.5
    occ = jnp.asarray(occ)

    o = rng.uniform(-1, 1, (64, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    rays = Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))

    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="march", compact=False)
    out_kernel = rend(params, rays, None, occ)
    # with the fold, every sample the mask keeps lies in an occupied bin
    assert np.isfinite(np.asarray(out_kernel.rgb)).all()

    def xla_impl(origins, directions, te, tx, occ_c, S, grid, probes=256,
                 interpret=False):
        t0, t1 = tightened_range(origins, directions, te, tx, occ_c, grid,
                                 probes=probes)
        t, _ = march_samples_t(t0, t1, S)
        m = (t1[:, None] > t0[:, None]) & occupancy_lookup(
            sample_positions(origins, directions, t), occ_c, grid
        )
        return t0, t1, m

    monkeypatch.setattr(gr, "tighten_sample_mask_pallas", xla_impl)
    rend_x = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                                strategy="march", compact=False)
    out_x = rend_x(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(out_kernel.rgb),
                               np.asarray(out_x.rgb), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_kernel.acc),
                               np.asarray(out_x.acc), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_kernel.depth),
                               np.asarray(out_x.depth), atol=2e-3)
