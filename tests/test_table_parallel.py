"""Table-parallel hash-grid on the virtual 8-device mesh: level-sharded
tables must reproduce the single-device gather encode, its gradients,
and a sharded optimizer step."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tnerf.config import FieldConfig
from tnerf.fields.hashgrid import apply_hashgrid_gather, init_hashgrid
from tnerf.parallel.table_parallel import (
    shard_hashgrid_params,
    tp_apply_hashgrid,
)


def _cfg(**kw):
    base = dict(
        encoding="hashgrid",
        hash_levels=8,
        hash_log2_table_size=13,
        hash_base_resolution=16,
        hash_max_resolution=256,
        compute_dtype="float32",
    )
    base.update(kw)
    return FieldConfig(**base)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))


@pytest.fixture(scope="module")
def setup(mesh):
    cfg = _cfg()
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (500, 3))
    return cfg, params, shard_hashgrid_params(params, mesh), x


def test_tp_forward_parity(setup, mesh):
    cfg, params, ps, x = setup
    ref = apply_hashgrid_gather(params, x, cfg)
    got = jax.jit(lambda p, xx: tp_apply_hashgrid(p, xx, cfg, mesh))(ps, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-9)


def test_tp_forward_parity_data_sharded(setup, mesh):
    # Composing with DP: the leading batch axis shards over "data" so
    # each chip encodes only its ray shard (500 % 2 == 0 -> sharded path).
    cfg, params, ps, x = setup
    ref = apply_hashgrid_gather(params, x, cfg)
    got = jax.jit(
        lambda p, xx: tp_apply_hashgrid(p, xx, cfg, mesh, data_axis="data")
    )(ps, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-9)
    # Indivisible leading dim falls back to replicated positions.
    x_odd = x[:333]
    ref_o = apply_hashgrid_gather(params, x_odd, cfg)
    got_o = jax.jit(
        lambda p, xx: tp_apply_hashgrid(p, xx, cfg, mesh, data_axis="data")
    )(ps, x_odd)
    np.testing.assert_allclose(np.asarray(ref_o), np.asarray(got_o), atol=1e-9)


def test_tp_gradient_parity(setup, mesh):
    cfg, params, ps, x = setup
    g = jax.random.normal(jax.random.PRNGKey(2), (x.shape[0], 16))

    def loss_ref(t, xx):
        return (apply_hashgrid_gather({"tables": t}, xx, cfg) * g).sum()

    def loss_tp(t, xx):
        return (tp_apply_hashgrid({"tables": t}, xx, cfg, mesh) * g).sum()

    dt_ref, dx_ref = jax.grad(loss_ref, argnums=(0, 1))(params["tables"], x)
    dt_tp, dx_tp = jax.jit(jax.grad(loss_tp, argnums=(0, 1)))(ps["tables"], x)
    np.testing.assert_allclose(
        np.asarray(dt_ref), np.asarray(dt_tp), atol=1e-6
    )
    # Position cotangents psum across level shards — the gather path's
    # real dL/dx, unlike the onehot path's zero-cotangent contract.
    np.testing.assert_allclose(
        np.asarray(dx_ref), np.asarray(dx_tp), atol=1e-6
    )


def test_tp_table_grads_stay_sharded(setup, mesh):
    # The backward must not unshard the tables: each shard's cotangent
    # is produced locally (megatron-embedding pattern).
    cfg, params, ps, x = setup
    g = jnp.ones((x.shape[0], 16))

    f = jax.jit(
        jax.grad(
            lambda t, xx: (tp_apply_hashgrid({"tables": t}, xx, cfg, mesh) * g).sum()
        ),
        in_shardings=(NamedSharding(mesh, P("model", None)), None),
    )
    dt = f(ps["tables"], x)
    assert dt.sharding.spec[0] == "model"


def test_tp_optimizer_step_sharded(setup, mesh):
    # One Adam step with tables and optimizer state level-sharded under
    # jit: state shards like params, update matches the unsharded step.
    cfg, params, ps, x = setup
    opt = optax.adam(1e-2)

    def loss(t, xx):
        return (tp_apply_hashgrid({"tables": t}, xx, cfg, mesh) ** 2).sum()

    def loss_ref(t, xx):
        return (apply_hashgrid_gather({"tables": t}, xx, cfg) ** 2).sum()

    shard = NamedSharding(mesh, P("model", None))

    @jax.jit
    def step(t, ost, xx):
        gr = jax.grad(loss)(t, xx)
        upd, ost = opt.update(gr, ost, t)
        return optax.apply_updates(t, upd), ost

    t0 = ps["tables"]
    ost = jax.jit(opt.init, out_shardings=None)(t0)
    t1, _ = step(t0, ost, x)

    gr_ref = jax.grad(loss_ref)(params["tables"], x)
    ost_ref = opt.init(params["tables"])
    upd_ref, _ = opt.update(gr_ref, ost_ref, params["tables"])
    t1_ref = optax.apply_updates(params["tables"], upd_ref)
    np.testing.assert_allclose(np.asarray(t1_ref), np.asarray(t1), atol=1e-6)
    assert t1.sharding.spec[0] == "model"


def test_tp_validates(setup, mesh):
    cfg, params, ps, x = setup
    with pytest.raises(ValueError, match="divide"):
        tp_apply_hashgrid(ps, x, _cfg(hash_levels=6), mesh)


def test_tp_nearest_levels_parity(setup, mesh):
    """Nearest-interpolated coarse levels under TP: the branchless
    snapped-frac formulation must match the single-device encode (which
    takes the static 1-corner fetch path) bit-for-bit, features AND
    table gradients."""
    _, params, ps, x = setup
    cfg = _cfg(hash_nearest_levels=3)
    ref = apply_hashgrid_gather(params, x, cfg)
    got = jax.jit(lambda p, xx: tp_apply_hashgrid(p, xx, cfg, mesh))(ps, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-9)

    g = jax.random.normal(jax.random.PRNGKey(3), ref.shape)
    dref = jax.grad(
        lambda t, xx: (apply_hashgrid_gather({"tables": t}, xx, cfg) * g).sum()
    )(params["tables"], x)
    dgot = jax.jit(
        jax.grad(
            lambda t, xx: (tp_apply_hashgrid({"tables": t}, xx, cfg, mesh) * g).sum()
        ),
        in_shardings=(NamedSharding(mesh, P("model", None)), None),
    )(ps["tables"], x)
    np.testing.assert_allclose(np.asarray(dref), np.asarray(dgot), atol=1e-6)
