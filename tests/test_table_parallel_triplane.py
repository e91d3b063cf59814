"""Table-parallel triplane on the virtual 8-device mesh: feature-sharded
planes/lines must reproduce the single-device gather encode, its
gradients (with table cotangents staying shard-local), and run_training
end-to-end on a DPxTP mesh (same strategy as the hashgrid TP suite)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tnerf.config import Config, FieldConfig
from tnerf.fields.triplane import apply_triplane_gather, init_triplane
from tnerf.parallel.table_parallel import (
    shard_triplane_params,
    tp_apply_triplane,
    tp_state_sharding,
)


def _cfg(**kw):
    base = dict(encoding="triplane", tri_resolution=16, tri_features=8)
    base.update(kw)
    return FieldConfig(**base)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))


@pytest.fixture(scope="module")
def setup(mesh):
    cfg = _cfg()
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (500, 3))
    return cfg, params, shard_triplane_params(params, mesh), x


def test_tp_tri_forward_parity(setup, mesh):
    cfg, params, ps, x = setup
    ref = apply_triplane_gather(params, x, cfg)
    got = jax.jit(lambda p, xx: tp_apply_triplane(p, xx, cfg, mesh))(ps, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_tp_tri_forward_parity_data_sharded(setup, mesh):
    cfg, params, ps, x = setup
    ref = apply_triplane_gather(params, x, cfg)
    got = jax.jit(
        lambda p, xx: tp_apply_triplane(p, xx, cfg, mesh, data_axis="data")
    )(ps, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)
    # indivisible leading dim falls back to replicated positions
    x_odd = x[:333]
    ref_o = apply_triplane_gather(params, x_odd, cfg)
    got_o = jax.jit(
        lambda p, xx: tp_apply_triplane(p, xx, cfg, mesh, data_axis="data")
    )(ps, x_odd)
    np.testing.assert_allclose(np.asarray(ref_o), np.asarray(got_o), atol=1e-6)


def test_tp_tri_gradient_parity(setup, mesh):
    cfg, params, ps, x = setup
    g = jax.random.normal(
        jax.random.PRNGKey(2), (x.shape[0], 3 * cfg.tri_features)
    )

    def loss_ref(p, xx):
        return (apply_triplane_gather(p, xx, cfg) * g).sum()

    def loss_tp(p, xx):
        return (tp_apply_triplane(p, xx, cfg, mesh) * g).sum()

    dref, dx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    dtp, dx_tp = jax.jit(jax.grad(loss_tp, argnums=(0, 1)))(ps, x)
    np.testing.assert_allclose(
        np.asarray(dref["planes"]), np.asarray(dtp["planes"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dref["lines"]), np.asarray(dtp["lines"]), atol=1e-5
    )
    # position cotangents psum across feature shards — real dL/dx (the
    # gather formulation, unlike the onehot path's zero-cotangent rule)
    np.testing.assert_allclose(np.asarray(dx_ref), np.asarray(dx_tp), atol=1e-4)


def test_tp_tri_table_grads_stay_sharded(setup, mesh):
    cfg, params, ps, x = setup
    g = jnp.ones((x.shape[0], 3 * cfg.tri_features))
    s = NamedSharding(mesh, P(None, None, "model"))

    f = jax.jit(
        jax.grad(lambda p, xx: (tp_apply_triplane(p, xx, cfg, mesh) * g).sum()),
        in_shardings=({"planes": s, "lines": s}, None),
    )
    d = f({"planes": ps["planes"], "lines": ps["lines"]}, x)
    assert d["planes"].sharding.spec[2] == "model"
    assert d["lines"].sharding.spec[2] == "model"


def test_tp_tri_validates(setup, mesh):
    cfg, params, ps, x = setup
    with pytest.raises(ValueError, match="divide"):
        tp_apply_triplane(ps, x, _cfg(tri_features=6), mesh)


def test_tp_state_sharding_covers_triplane(setup, mesh):
    import optax

    cfg, params, ps, x = setup
    tree = {"params": {"triplane": params, "trunk": {"w": jnp.ones((4, 4))}}}
    tree["opt"] = optax.adam(1e-3).init(tree["params"])
    spec = tp_state_sharding(tree, mesh, "model")
    assert spec["params"]["triplane"]["planes"].spec == P(None, None, "model")
    assert spec["params"]["triplane"]["lines"].spec == P(None, None, "model")
    assert spec["params"]["trunk"]["w"].spec == P()
    # Adam mu/nu mirror the param tree -> table moments shard too
    mu = spec["opt"][0].mu["triplane"]["planes"]
    assert mu.spec == P(None, None, "model")


def test_run_training_tp_triplane(tmp_path):
    """run_training consumes table_parallel with the triplane encoding
    on a DPxTP mesh: full train step + occupancy + eval + checkpoint."""
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    assert len(jax.devices()) >= 8
    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.encoding=triplane", "field_.tri_resolution=16",
        "field_.tri_features=8", "field_.tri_hidden_width=32",
        "field_.tri_hidden_layers=2",
        "parallel.data_parallel=2", "parallel.table_parallel=4",
        "train.batch_size=256", "train.steps=10", "train.eval_every=5",
        "train.checkpoint_every=10", "train.log_every=5",
        f"logging.out_dir={tmp_path / 'tp_tri_run'}",
        "render.chunk_size=1024",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])


def test_sp_tp_triplane_rejected(tmp_path):
    """SPxTP composition is hashgrid-only (tp_encode_local): triplane
    must fail loudly at config time, not deep in the SP renderer."""
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=16, height=16, n_train=2, n_val=1, n_test=1, n_samples=32
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "render.pipeline=grid_intervals",
        "grid.resolution=8", "grid.max_hits=8",
        "field_.encoding=triplane",
        "parallel.data_parallel=2", "parallel.sample_parallel=2",
        "parallel.table_parallel=2",
        "train.steps=2", f"logging.out_dir={tmp_path}",
    ])
    with pytest.raises(ValueError, match="hashgrid only"):
        run_training(cfg, datasets=scene)
