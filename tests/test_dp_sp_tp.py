"""3-axis (data x sample x model) mesh composition: DP over rays,
SP over the samples-per-ray quadrature, TP over hash-grid level tables —
all inside the sample-parallel renderer's single shard_map (shard_maps
do not nest, so the TP encode runs inline via tp_encode_local).

Parity references are JITTED: unjitted-vs-jitted XLA fusion rounding on
the compositing backward is ~1e-1 relative on near-zero sparse table
gradients, dwarfing any real defect; jit-vs-jit agrees to ~1e-7."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tnerf.cameras import Rays, viewdirs_to_thetaphi
from tnerf.config import Config
from tnerf.fields.nerf_field import NeRFField
from tnerf.parallel.mesh import make_mesh
from tnerf.parallel.sample_parallel import make_sp_interval_renderer
from tnerf.parallel.table_parallel import shard_hashgrid_params
from tnerf.render.grid_renderer import make_grid_renderer


@pytest.fixture(scope="module")
def setup():
    cfg = Config().apply_overrides([
        "render.pipeline=grid_intervals",
        "field_.encoding=hashgrid", "field_.hash_levels=8",
        "field_.hash_log2_table_size=12", "field_.hash_max_resolution=64",
        "field_.hash_gather_mode=gather", "field_.compute_dtype=float32",
        "grid.resolution=16", "grid.max_hits=12",
        "sampler.samples_per_interval=4",  # S = 48 -> 24 per sample shard
        "scene.scene_scale=1.0",
    ])
    field = NeRFField(cfg.field_, cfg.grid, arch="twobranch")
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B = 64
    o = rng.uniform(-1, 1, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o + rng.normal(0, 0.2, (B, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        viewdirs_to_thetaphi(jnp.asarray(d, jnp.float32)),
    )
    occ = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (16, 16, 16)) < 0.4
    )
    ref_r = make_grid_renderer(
        field, cfg.grid, cfg.sampler, cfg.render,
        strategy="intervals", compact=False,
    )
    return cfg, field, params, rays, occ, ref_r


@pytest.fixture(scope="module")
def mesh():
    return Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2),
        ("data", "sample", "model"),
    )


def _sharded(params, mesh):
    return {**params, "hashgrid": shard_hashgrid_params(params["hashgrid"], mesh)}


def test_dp_sp_tp_render_parity(setup, mesh):
    cfg, field, params, rays, occ, ref_r = setup
    sp_r = make_sp_interval_renderer(
        field, cfg.grid, cfg.sampler, cfg.render, mesh,
        data_axis="data", sample_axis="sample", model_axis="model",
    )
    ref = jax.jit(lambda p, r, oc: ref_r(p, r, None, oc))(params, rays, occ)
    got = jax.jit(lambda p, r, oc: sp_r(p, r, None, oc))(
        _sharded(params, mesh), rays, occ
    )
    np.testing.assert_allclose(np.asarray(ref.rgb), np.asarray(got.rgb), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ref.acc), np.asarray(got.acc), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(ref.weights), np.asarray(got.weights), atol=5e-5
    )


def test_dp_sp_tp_gradient_parity_and_local_table_grads(setup, mesh):
    """Gradients through the 3-axis shard_map match the single-device
    renderer; the table cotangents come back level-SHARDED over 'model'
    (the all_gather's reduce-scatter VJP keeps them local — the tables
    never cross chips in either direction)."""
    cfg, field, params, rays, occ, ref_r = setup
    sp_r = make_sp_interval_renderer(
        field, cfg.grid, cfg.sampler, cfg.render, mesh,
        data_axis="data", sample_axis="sample", model_axis="model",
    )

    def loss_ref(p):
        return (ref_r(p, rays, None, occ).rgb ** 2).sum()

    def loss_sp(p):
        return (sp_r(p, rays, None, occ).rgb ** 2).sum()

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_sp = jax.jit(jax.grad(loss_sp))(_sharded(params, mesh))
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_sp),
    ):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12))
        assert rel < 1e-5, f"{jax.tree_util.keystr(path)}: rel {rel}"
    spec = g_sp["hashgrid"]["tables"].sharding.spec
    assert spec[0] == "model", spec


def test_make_mesh_three_axes():
    m = make_mesh(2, "data", "sample", 2, "model", 2)
    assert dict(m.shape) == {"data": 2, "sample": 2, "model": 2}
    # auto data size fills the remaining devices
    m2 = make_mesh(-1, "data", "sample", 2, "model", 2)
    assert m2.shape["data"] == len(jax.devices()) // 4
    # 2-axis and 1-axis forms unchanged
    assert tuple(make_mesh(4, "data", "sample", 2).shape.items()) == (
        ("data", 4), ("sample", 2),
    )
    assert tuple(make_mesh(8).shape.items()) == (("data", 8),)


def test_run_training_dp_sp_tp(tmp_path):
    """run_training consumes sample_parallel AND table_parallel together
    on the 3-axis mesh: full train step + occupancy updates + eval."""
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    assert len(jax.devices()) >= 8
    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_intervals",
        "grid.resolution=8", "grid.max_hits=8", "grid.warmup_steps=5",
        "grid.update_every=5",
        "sampler.samples_per_interval=4", "sampler.near=2.0", "sampler.far=5.5",
        "field_.encoding=hashgrid", "field_.hash_levels=8",
        "field_.hash_log2_table_size=12", "field_.hash_max_resolution=64",
        "field_.hash_gather_mode=gather",
        "parallel.data_parallel=2", "parallel.sample_parallel=2",
        "parallel.table_parallel=2",
        "train.batch_size=256", "train.steps=12", "train.eval_every=6",
        "train.checkpoint_every=0", "train.log_every=6",
        f"logging.out_dir={tmp_path / 'dsp_run'}",
        "render.chunk_size=1024",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])


def test_tp_checkpoint_resume_reshards(tmp_path):
    """Checkpoint/resume round-trip under table parallelism: the sharded
    train state gathers to a host npz at save, restores replicated, and
    the DP train-step's in_shardings re-shard the tables on the first
    resumed step — the flow a real multi-chip user hits."""
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    assert len(jax.devices()) >= 8
    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    out = str(tmp_path / "tp_ckpt_run")
    base = [
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.encoding=hashgrid", "field_.hash_levels=8",
        "field_.hash_log2_table_size=12", "field_.hash_max_resolution=64",
        "field_.hash_gather_mode=gather",
        "parallel.data_parallel=2", "parallel.table_parallel=4",
        "train.batch_size=256", "train.steps=10", "train.eval_every=0",
        "train.checkpoint_every=10", "train.log_every=5",
        f"logging.out_dir={out}", "render.chunk_size=1024",
    ]
    run_training(Config().apply_overrides(base), datasets=scene)
    cfg2 = Config().apply_overrides(base + [
        "train.resume=true", "train.steps=16",
    ])
    m = run_training(cfg2, datasets=scene)
    assert np.isfinite(m["psnr_test"])


def test_dp_sp_tp_render_parity_nearest_levels(setup, mesh):
    """hash_nearest_levels under the 3-axis mesh: tp_encode_local's
    branchless snapped-frac nearest matches the single-device renderer
    (whose encode takes the static 1-corner path)."""
    cfg0, _, params, rays, occ, _ = setup
    cfg = cfg0.apply_overrides(["field_.hash_nearest_levels=4"])
    field = NeRFField(cfg.field_, cfg.grid, arch="twobranch")
    ref_r = make_grid_renderer(
        field, cfg.grid, cfg.sampler, cfg.render,
        strategy="intervals", compact=False,
    )
    sp_r = make_sp_interval_renderer(
        field, cfg.grid, cfg.sampler, cfg.render, mesh,
        data_axis="data", sample_axis="sample", model_axis="model",
    )
    ref = jax.jit(lambda p, r, oc: ref_r(p, r, None, oc))(params, rays, occ)
    got = jax.jit(lambda p, r, oc: sp_r(p, r, None, oc))(
        _sharded(params, mesh), rays, occ
    )
    np.testing.assert_allclose(np.asarray(ref.rgb), np.asarray(got.rgb), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ref.acc), np.asarray(got.acc), atol=5e-5)
