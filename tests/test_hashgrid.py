"""Hash-grid encoding tests: numpy mirror parity, interpolation
properties, gradient flow (SURVEY §4 'hash-encoding vs a numpy mirror')."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from tnerf.config import Config, FieldConfig
from tnerf.fields.hashgrid import (
    apply_hashgrid,
    hashgrid_num_params,
    init_hashgrid,
    level_resolutions,
)
from tnerf.fields.nerf_field import NeRFField


def small_cfg(**kw):
    base = dict(
        encoding="hashgrid", hash_levels=4, hash_features_per_level=2,
        hash_log2_table_size=10, hash_base_resolution=4, hash_max_resolution=32,
    )
    base.update(kw)
    return FieldConfig(**base)


def numpy_hashgrid(tables, x01, cfg):
    """Independent numpy mirror of apply_hashgrid."""
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    res = level_resolutions(cfg)
    out = np.zeros((x01.shape[0], L, F), np.float32)
    for l in range(L):
        N = int(res[l])
        pos = np.clip(x01 * N, 0, N - 1e-4)
        i0 = np.floor(pos).astype(np.uint32)
        frac = (pos - i0).astype(np.float32)
        dense = (N + 1) ** 3 <= T
        for c in range(8):
            off = np.array([(c >> 2) & 1, (c >> 1) & 1, c & 1], np.uint32)
            cx = i0 + off
            w = np.prod(np.where(off.astype(bool), frac, 1 - frac), axis=-1)
            if dense:
                idx = cx[:, 0] + (N + 1) * (cx[:, 1] + (N + 1) * cx[:, 2])
            else:
                idx = (
                    cx[:, 0] * np.uint32(1)
                    ^ cx[:, 1] * np.uint32(2654435761)
                    ^ cx[:, 2] * np.uint32(805459861)
                )
            idx = (idx & np.uint32(T - 1)).astype(np.int64) + l * T
            out[:, l] += w[:, None] * tables[idx]
    return out.reshape(x01.shape[0], L * F)


def test_matches_numpy_mirror():
    cfg = small_cfg()
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    got = np.asarray(apply_hashgrid(params, jnp.asarray(x), cfg))
    want = numpy_hashgrid(np.asarray(params["tables"]), x, cfg)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_corner_ordering_matches_weights():
    """At an exact lattice point the encoding must equal that corner's
    table entry (all weight on one corner) — catches corner/weight
    mismatches the mirror test could share."""
    cfg = small_cfg(hash_levels=1, hash_base_resolution=4, hash_max_resolution=4)
    params = init_hashgrid(jax.random.PRNGKey(1), cfg)
    tab = np.asarray(params["tables"])
    x = np.array([[0.25, 0.5, 0.75]], np.float32)  # lattice point at N=4: (1,2,3)
    got = np.asarray(apply_hashgrid(params, jnp.asarray(x), cfg))[0]
    idx = 1 + 5 * (2 + 5 * 3)  # dense linear index at N+1=5
    np.testing.assert_allclose(got, tab[idx], atol=1e-6)


def test_continuity_across_cell_boundary():
    cfg = small_cfg()
    params = init_hashgrid(jax.random.PRNGKey(2), cfg)
    eps = 1e-5
    x = jnp.asarray([[0.5 - eps, 0.3, 0.3], [0.5 + eps, 0.3, 0.3]])
    out = np.asarray(apply_hashgrid(params, x, cfg))
    np.testing.assert_allclose(out[0], out[1], atol=1e-3)


def test_gradients_reach_tables():
    cfg = small_cfg()
    params = init_hashgrid(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 3)), jnp.float32)

    def loss(p):
        return jnp.sum(apply_hashgrid(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)["tables"]
    gnp = np.asarray(g)
    assert np.isfinite(gnp).all()
    assert (np.abs(gnp).sum(axis=-1) > 0).sum() > 0  # some entries touched
    assert hashgrid_num_params(cfg) == g.size


def test_full_field_with_hashgrid_trains():
    cfg = Config().apply_overrides([
        "field_.encoding=hashgrid", "field_.hash_levels=4",
        "field_.hash_log2_table_size=10", "field_.hash_base_resolution=4",
        "field_.hash_max_resolution=32", "field_.hash_hidden_width=32",
        "field_.hash_hidden_layers=2",
    ])
    field = NeRFField(cfg.field_, cfg.grid, arch="twobranch")
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    v = jnp.zeros((16, 2))
    rgb, sigma = field.apply(params, x, v)
    assert rgb.shape == (16, 3) and sigma.shape == (16,)

    def loss(p):
        rgb, sigma = field.apply(p, x, v)
        return jnp.mean(rgb) + jnp.mean(sigma)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
    assert float(jnp.abs(g["hashgrid"]["tables"]).sum()) > 0


# ---- MXU one-hot (matmul-gather) formulation ------------------------------


def test_onehot_matches_gather_exactly():
    """With float32 compute the one-hot matmul formulation is bit-exact
    against the gather formulation (one-hot rows select without rounding;
    identical corner accumulation order)."""
    from tnerf.fields.hashgrid import apply_hashgrid_gather, apply_hashgrid_onehot

    cfg = small_cfg(compute_dtype="float32")
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (333, 3))
    a = apply_hashgrid_gather(params, x, cfg)
    b = apply_hashgrid_onehot(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_onehot_chunked_matches_and_keeps_shape():
    from tnerf.fields.hashgrid import apply_hashgrid_gather, apply_hashgrid_onehot

    cfg = small_cfg(compute_dtype="float32")
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (5, 1000, 3))
    a = apply_hashgrid_gather(params, x, cfg)
    b = apply_hashgrid_onehot(params, x, cfg, chunk=2048)
    assert b.shape == a.shape
    # Under the chunk scan XLA fuses the weight FMA differently, so the
    # chunked path is allclose (1e-11-scale FMA rounding), not bit-equal.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)


def test_onehot_grads_match_gather():
    """Autodiff through the one-hot matmul (dense matmul accumulation)
    equals autodiff through the gather (scatter-add) — the deterministic
    replacement for tcnn's fp16 atomic grads."""
    from tnerf.fields.hashgrid import apply_hashgrid_gather, apply_hashgrid_onehot

    cfg = small_cfg(compute_dtype="float32")
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (257, 3))

    def loss(tables, fn):
        return jnp.sum(fn({"tables": tables}, x, cfg) ** 2)

    ga = jax.grad(lambda t: loss(t, apply_hashgrid_gather))(params["tables"])
    gb = jax.grad(lambda t: loss(t, apply_hashgrid_onehot))(params["tables"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-12)


def test_onehot_rejects_oversize_table():
    from tnerf.fields.hashgrid import apply_hashgrid_onehot

    cfg = small_cfg(hash_log2_table_size=16)
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((4, 3))
    with pytest.raises(ValueError):
        apply_hashgrid_onehot(params, x, cfg)


def test_resolve_gather_mode():
    from tnerf.fields.hashgrid import resolve_gather_mode

    assert resolve_gather_mode(small_cfg(hash_gather_mode="onehot")) == "onehot"
    assert resolve_gather_mode(small_cfg(hash_gather_mode="gather")) == "gather"
    # auto on CPU -> gather (onehot only pays on TPU)
    assert resolve_gather_mode(small_cfg()) == "gather"


def test_onehot_grads_match_gather_multichunk():
    """Gradient parity must hold across the multi-chunk scan path of the
    hand-written VJP (accumulator carried across chunks)."""
    from tnerf.fields.hashgrid import apply_hashgrid_gather, apply_hashgrid_onehot

    cfg = small_cfg(compute_dtype="float32")
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (300, 3))

    def loss(tables, fn, **kw):
        return jnp.sum(fn({"tables": tables}, x, cfg, **kw) ** 2)

    ga = jax.grad(lambda t: loss(t, apply_hashgrid_gather))(params["tables"])
    gb = jax.grad(lambda t: loss(t, apply_hashgrid_onehot, chunk=128))(params["tables"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-11)


def test_onehot_positions_get_zero_cotangent():
    """The hand-written VJP deliberately returns zero position gradients
    (documented contract); the gather path returns real ones."""
    from tnerf.fields.hashgrid import apply_hashgrid_gather, apply_hashgrid_onehot

    cfg = small_cfg(compute_dtype="float32")
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (64, 3))
    g_oh = jax.grad(lambda x: jnp.sum(apply_hashgrid_onehot(params, x, cfg)))(x)
    np.testing.assert_array_equal(np.asarray(g_oh), 0.0)
    g_ga = jax.grad(lambda x: jnp.sum(apply_hashgrid_gather(params, x, cfg)))(x)
    assert float(jnp.abs(g_ga).max()) > 0.0


# ---- nearest-interpolation coarse levels (tcnn 'Nearest' parity) ----------


def numpy_hashgrid_nearest(tables, x01, cfg):
    """Numpy mirror with hash_nearest_levels: the first K levels take the
    rounded-vertex entry with weight 1; the rest are trilinear."""
    L, F, K = cfg.hash_levels, cfg.hash_features_per_level, cfg.hash_nearest_levels
    T = 1 << cfg.hash_log2_table_size
    res = level_resolutions(cfg)
    out = np.asarray(
        numpy_hashgrid(tables, x01, cfg).reshape(x01.shape[0], L, F)
    ).copy()
    for l in range(K):
        N = int(res[l])
        pos = np.clip(x01 * N, 0, N - 1e-4)
        i0 = np.floor(pos).astype(np.uint32)
        frac = (pos - i0).astype(np.float32)
        cx = i0 + (frac >= 0.5).astype(np.uint32)
        if (N + 1) ** 3 <= T:
            idx = cx[:, 0] + (N + 1) * (cx[:, 1] + (N + 1) * cx[:, 2])
        else:
            idx = (
                cx[:, 0] * np.uint32(1)
                ^ cx[:, 1] * np.uint32(2654435761)
                ^ cx[:, 2] * np.uint32(805459861)
            )
        out[:, l] = tables[(idx & np.uint32(T - 1)).astype(np.int64) + l * T]
    return out.reshape(x01.shape[0], L * F)


@pytest.mark.parametrize("K", [1, 2, 4])
def test_nearest_levels_match_numpy_mirror(K):
    cfg = small_cfg(hash_nearest_levels=K)
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), (211, 3)))
    got = apply_hashgrid(params, jnp.asarray(x), cfg)
    want = numpy_hashgrid_nearest(np.asarray(params["tables"]), x, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("K", [1, 3, 4])
def test_nearest_onehot_matches_gather(K):
    from tnerf.fields.hashgrid import apply_hashgrid_gather, apply_hashgrid_onehot

    cfg = small_cfg(compute_dtype="float32", hash_nearest_levels=K)
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(8), (333, 3))
    a = apply_hashgrid_gather(params, x, cfg)
    b = apply_hashgrid_onehot(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nearest_onehot_grads_match_gather():
    from tnerf.fields.hashgrid import apply_hashgrid_gather, apply_hashgrid_onehot

    cfg = small_cfg(compute_dtype="float32", hash_nearest_levels=2)
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (300, 3))

    def loss(tables, fn, **kw):
        return jnp.sum(fn({"tables": tables}, x, cfg, **kw) ** 2)

    ga = jax.grad(lambda t: loss(t, apply_hashgrid_gather))(params["tables"])
    gb = jax.grad(lambda t: loss(t, apply_hashgrid_onehot))(params["tables"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-12)
    # multi-chunk scan path of the hand-written VJP
    gc = jax.grad(lambda t: loss(t, apply_hashgrid_onehot, chunk=128))(params["tables"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gc), rtol=1e-5, atol=1e-11)


def test_nearest_levels_piecewise_constant():
    """A nearest level's contribution is constant within a vertex cell:
    two points that round to the same vertices on every level agree."""
    cfg = small_cfg(hash_nearest_levels=4)  # all levels nearest
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    # res = [4, 8, 16, 32]: these perturbed points stay on the same side
    # of every level's 0.5-frac rounding boundary.
    a = apply_hashgrid(params, jnp.array([[0.2, 0.2, 0.4]]), cfg)
    b = apply_hashgrid(params, jnp.array([[0.201, 0.201, 0.401]]), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nearest_levels_out_of_range_raises():
    cfg = small_cfg(hash_nearest_levels=5)
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        apply_hashgrid(params, jnp.zeros((4, 3)), cfg)
