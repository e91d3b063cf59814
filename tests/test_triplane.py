"""Triplane (TensoRF-style VM) encoding tests: numpy mirror parity,
onehot-vs-gather parity (values and gradients), chunking invariance, and
field/training integration (same strategy as the hash-grid suite)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from tnerf.config import Config, FieldConfig
from tnerf.data.procedural import generate_procedural_scene
from tnerf.fields.nerf_field import NeRFField
from tnerf.fields.triplane import (
    _PLANE_AXES,
    _LINE_AXIS,
    apply_triplane,
    apply_triplane_gather,
    apply_triplane_onehot,
    init_triplane,
    resolve_tri_mode,
    triplane_num_params,
)


def small_cfg(**kw):
    base = dict(encoding="triplane", tri_resolution=16, tri_features=4)
    base.update(kw)
    return FieldConfig(**base)


def numpy_triplane(params, x01, cfg):
    """Independent numpy mirror of apply_triplane (VM decomposition)."""
    R, F = cfg.tri_resolution, cfg.tri_features
    planes = np.asarray(params["planes"])  # [3, R*R, F]
    lines = np.asarray(params["lines"])  # [3, R, F]
    n = x01.shape[0]
    out = np.zeros((n, 3, F), np.float32)
    pos = np.clip(x01 * (R - 1), 0, (R - 1) - 1e-4)
    i0 = np.floor(pos).astype(np.int64)
    frac = (pos - i0).astype(np.float32)
    for p in range(3):
        au, av = _PLANE_AXES[p]
        al = _LINE_AXIS[p]
        B = np.zeros((n, F), np.float32)
        for c in range(4):
            du, dv = (c >> 1) & 1, c & 1
            u, v = i0[:, au] + du, i0[:, av] + dv
            w = (frac[:, au] if du else 1 - frac[:, au]) * (
                frac[:, av] if dv else 1 - frac[:, av]
            )
            B += w[:, None] * planes[p, u * R + v]
        Lin = (1 - frac[:, al])[:, None] * lines[p, i0[:, al]] + frac[:, al][
            :, None
        ] * lines[p, i0[:, al] + 1]
        out[:, p] = B * Lin
    return out.reshape(n, 3 * F)


def test_gather_matches_numpy_mirror():
    cfg = small_cfg()
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    got = np.asarray(apply_triplane_gather(params, x, cfg))
    want = numpy_triplane(params, np.asarray(x), cfg)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_continuity_across_cell_boundary():
    cfg = small_cfg()
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    R = cfg.tri_resolution
    eps = 1e-5
    b = 3.0 / (R - 1)  # a vertex plane in x
    lo = jnp.array([[b - eps, 0.37, 0.61]])
    hi = jnp.array([[b + eps, 0.37, 0.61]])
    a = apply_triplane_gather(params, lo, cfg)
    c = apply_triplane_gather(params, hi, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-3)


def test_corners_exact_at_vertices():
    """At a vertex position the VM feature is exactly
    plane[u,v] * line[w] (all interpolation weight on one corner)."""
    cfg = small_cfg()
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    R, F = cfg.tri_resolution, cfg.tri_features
    u, v, w = 3, 5, 7
    x = jnp.array([[u, v, w]], jnp.float32) / (R - 1)
    got = np.asarray(apply_triplane_gather(params, x, cfg)).reshape(3, F)
    planes = np.asarray(params["planes"])
    lines = np.asarray(params["lines"])
    ivw = (u, v, w)
    for p in range(3):
        au, av = _PLANE_AXES[p]
        al = _LINE_AXIS[p]
        want = planes[p, ivw[au] * R + ivw[av]] * lines[p, ivw[al]]
        np.testing.assert_allclose(got[p], want, rtol=1e-5, atol=1e-6)


# ---- MXU one-hot (matmul-gather) formulation ------------------------------


def test_onehot_matches_gather():
    cfg = small_cfg(compute_dtype="float32")
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (96, 3))
    a = np.asarray(apply_triplane_gather(params, x, cfg))
    b = np.asarray(apply_triplane_onehot(params, x, cfg))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_onehot_padding_path():
    """R*R not a multiple of 128 exercises the row-padding path."""
    cfg = small_cfg(tri_resolution=10, compute_dtype="float32")
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    a = np.asarray(apply_triplane_gather(params, x, cfg))
    b = np.asarray(apply_triplane_onehot(params, x, cfg))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_onehot_chunked_matches_and_keeps_shape():
    cfg = small_cfg(compute_dtype="float32")
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (70, 3))  # pads to 2 chunks
    a = np.asarray(apply_triplane_onehot(params, x, cfg, chunk=64))
    b = np.asarray(apply_triplane_onehot(params, x, cfg, chunk=128))
    assert a.shape == (70, 3 * cfg.tri_features)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_onehot_grads_match_gather():
    cfg = small_cfg(compute_dtype="float32")
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (80, 3))
    cot = jax.random.normal(jax.random.PRNGKey(2), (80, 3 * cfg.tri_features))

    def loss(p, fn):
        return jnp.sum(fn(p, x, cfg) * cot)

    ga = jax.grad(lambda p: loss(p, apply_triplane_gather))(params)
    gb = jax.grad(lambda p: loss(p, lambda *a: apply_triplane_onehot(*a, chunk=32)))(
        params
    )
    np.testing.assert_allclose(
        np.asarray(ga["planes"]), np.asarray(gb["planes"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ga["lines"]), np.asarray(gb["lines"]), rtol=1e-5, atol=1e-6
    )


def test_onehot_positions_get_zero_cotangent():
    cfg = small_cfg(compute_dtype="float32")
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    g = jax.grad(lambda xx: jnp.sum(apply_triplane_onehot(params, xx, cfg)))(x)
    assert float(jnp.abs(g).sum()) == 0.0


def test_onehot_rejects_oversize_plane():
    cfg = small_cfg(tri_resolution=256)
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="2\\^15"):
        apply_triplane_onehot(params, jnp.zeros((4, 3)), cfg)


def test_resolve_tri_mode():
    # explicit modes pass through; auto on CPU is gather
    assert resolve_tri_mode(small_cfg(tri_gather_mode="onehot")) == "onehot"
    assert resolve_tri_mode(small_cfg(tri_gather_mode="gather")) == "gather"
    assert resolve_tri_mode(small_cfg()) == "gather"  # CPU backend


def test_num_params():
    cfg = small_cfg()
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    n = sum(np.asarray(v).size for v in jax.tree.leaves(params))
    assert n == triplane_num_params(cfg)


def test_table_l1_regularizer_pulls_unobserved_entries_to_zero():
    """With table_l1_weight set, a table entry with ZERO photometric
    gradient still gets a shrink-toward-zero update; with 0 it does not."""
    from types import SimpleNamespace

    from tnerf.train import RayBatch, TrainState, create_optimizer, make_train_step
    from tnerf.config import TrainConfig
    from tnerf.cameras import Rays

    params = {
        "triplane": {
            "planes": jnp.full((3, 4, 2), 0.5),
            "lines": jnp.full((3, 2, 2), 0.5),
        },
        "trunk": {"w": jnp.ones((2, 2))},
    }

    def fake_renderer(p, rays, key, occ):
        # photometric loss only sees the trunk; tables are "unobserved"
        rgb = jnp.ones((4, 3)) * jnp.mean(p["trunk"]["w"])
        return SimpleNamespace(rgb=rgb, acc=jnp.ones((4,)))

    batch = RayBatch(
        rays=Rays(
            origins=jnp.zeros((4, 3)), directions=jnp.ones((4, 3)),
            viewdirs_tp=jnp.zeros((4, 2)),
        ),
        gt_rgb=jnp.zeros((4, 3)),
    )
    opt = create_optimizer(TrainConfig(skip_nonfinite=False))
    for w, moved in [(0.0, False), (0.01, True)]:
        step = make_train_step(fake_renderer, opt, table_l1=w)
        st = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        st2, aux = step(st, batch, jax.random.PRNGKey(0))
        delta = float(
            jnp.abs(st2.params["triplane"]["planes"] - params["triplane"]["planes"]).sum()
        )
        assert (delta > 0) == moved, (w, delta)
        if moved:  # the update shrinks magnitude (L1 pulls toward zero)
            assert float(st2.params["triplane"]["planes"].mean()) < 0.5


def test_triplane_tv_semantics():
    """TV is zero on constant tables, positive on noisy ones, and its
    gradient pulls a spike toward its neighbors."""
    from tnerf.fields.triplane import triplane_tv

    const = {
        "planes": jnp.full((3, 25, 2), 0.7),
        "lines": jnp.full((3, 5, 2), -0.3),
    }
    assert float(triplane_tv(const)) == 0.0
    noisy = {
        "planes": jax.random.normal(jax.random.PRNGKey(0), (3, 25, 2)),
        "lines": jax.random.normal(jax.random.PRNGKey(1), (3, 5, 2)),
    }
    assert float(triplane_tv(noisy)) > 0.0
    # gradient at a spike points down (toward the flat neighborhood)
    spiked = {
        "planes": const["planes"].at[0, 12, 0].set(5.0),
        "lines": const["lines"],
    }
    g = jax.grad(lambda p: triplane_tv(p))(spiked)
    assert float(g["planes"][0, 12, 0]) > 0.0  # descent lowers the spike
    assert float(jnp.abs(g["lines"]).sum()) == 0.0


def test_table_tv_regularizer_smooths_unobserved_entries():
    """With table_tv_weight set, a spiked plane entry with ZERO
    photometric gradient still gets pulled toward its neighbors; the
    knob also rejects non-triplane encodings at run_training level."""
    from types import SimpleNamespace

    from tnerf.train import RayBatch, TrainState, create_optimizer, make_train_step
    from tnerf.config import TrainConfig
    from tnerf.cameras import Rays

    planes = jnp.zeros((3, 16, 2)).at[0, 5, 0].set(3.0)
    params = {
        "triplane": {"planes": planes, "lines": jnp.zeros((3, 4, 2))},
        "trunk": {"w": jnp.ones((2, 2))},
    }

    def fake_renderer(p, rays, key, occ):
        rgb = jnp.ones((4, 3)) * jnp.mean(p["trunk"]["w"])
        return SimpleNamespace(rgb=rgb, acc=jnp.ones((4,)))

    batch = RayBatch(
        rays=Rays(
            origins=jnp.zeros((4, 3)), directions=jnp.ones((4, 3)),
            viewdirs_tp=jnp.zeros((4, 2)),
        ),
        gt_rgb=jnp.zeros((4, 3)),
    )
    opt = create_optimizer(TrainConfig(skip_nonfinite=False))
    for w, moved in [(0.0, False), (0.01, True)]:
        step = make_train_step(fake_renderer, opt, table_tv=w)
        st = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        st2, _ = step(st, batch, jax.random.PRNGKey(0))
        delta = float(
            jnp.abs(st2.params["triplane"]["planes"] - planes).sum()
        )
        assert (delta > 0) == moved, (w, delta)
        if moved:
            assert float(st2.params["triplane"]["planes"][0, 5, 0]) < 3.0


def test_table_tv_rejects_non_triplane_encoding(tmp_path):
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=16, height=16, n_train=2, n_val=1, n_test=1, n_samples=32
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "render.pipeline=grid_march",
        "train.table_tv_weight=0.01", "train.steps=2",
        f"logging.out_dir={tmp_path}",
    ])
    with pytest.raises(ValueError, match="triplane"):
        run_training(cfg, datasets=scene)


# ---- field / training integration ------------------------------------------


def test_full_field_with_triplane_trains():
    cfg = Config().apply_overrides([
        "field_.encoding=triplane", "field_.tri_resolution=16",
        "field_.tri_features=4", "field_.tri_hidden_width=32",
        "field_.tri_hidden_layers=2",
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
    assert float(jnp.abs(g["triplane"]["planes"]).sum()) > 0
    assert float(jnp.abs(g["triplane"]["lines"]).sum()) > 0


def test_run_training_triplane(tmp_path):
    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    from tnerf.train_loop import run_training

    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "field_.encoding=triplane", "field_.tri_resolution=16",
        "field_.tri_features=4", "field_.tri_hidden_width=32",
        "field_.tri_hidden_layers=2",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=256", "train.steps=30", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=10",
        f"logging.out_dir={tmp_path}",
        "render.chunk_size=1024",
    ])
    metrics = run_training(cfg, datasets=scene)
    assert "psnr_test" in metrics and np.isfinite(metrics["psnr_test"])
    # training moved the loss: the metrics stream shows a finite,
    # decreasing loss between the first and last logged steps
    import json

    lines = [json.loads(l) for l in open(f"{tmp_path}/metrics.jsonl")]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


# ---- progressive (coarse-to-fine) upsampling --------------------------------


def test_upsample_preserves_field_on_nested_grids():
    """(R_new-1) % (R_old-1) == 0: every old vertex is a new vertex, so
    the resampled tables represent the SAME interpolant — apply agrees
    everywhere, not just at vertices."""
    from tnerf.fields.triplane import upsample_triplane

    cfg_old = small_cfg(tri_resolution=5)
    cfg_new = small_cfg(tri_resolution=9)
    params = init_triplane(jax.random.PRNGKey(0), cfg_old)
    up = upsample_triplane(params, 9)
    assert up["planes"].shape == (3, 81, 4)
    assert up["lines"].shape == (3, 9, 4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    a = apply_triplane_gather(params, x, cfg_old)
    b = apply_triplane_gather(up, x, cfg_new)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)


def test_upsample_matches_old_interpolant_at_new_vertices():
    """Any R_new: the resized line table equals the old interpolant
    sampled at the new vertex positions (align-corners semantics)."""
    from tnerf.fields.triplane import _resize_vertex_axis

    r_old, r_new = 6, 10
    line = np.random.RandomState(0).randn(r_old).astype(np.float32)
    got = np.asarray(_resize_vertex_axis(jnp.asarray(line), 0, r_new))
    pos_new = np.linspace(0.0, 1.0, r_new)
    want = np.interp(pos_new, np.linspace(0.0, 1.0, r_old), line)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_tri_stage_plan_endpoints_and_validation():
    from tnerf.train_loop import _tri_stage_plan

    cfg = Config().apply_overrides([
        "field_.encoding=triplane", "field_.tri_resolution=128",
        "field_.tri_init_resolution=32",
        "field_.tri_upsample_steps=[100, 200]", "train.steps=500",
    ])
    plan = _tri_stage_plan(cfg)
    assert plan[0] == (100, 32) and plan[-1] == (500, 128)
    assert [r for _, r in plan] == sorted(r for _, r in plan)

    bad = cfg.apply_overrides(["field_.tri_upsample_steps=[600]"])
    with pytest.raises(ValueError, match="strictly increasing"):
        _tri_stage_plan(bad)
    bad = cfg.apply_overrides(["field_.tri_init_resolution=0"])
    with pytest.raises(ValueError, match="tri_init_resolution"):
        _tri_stage_plan(bad)
    bad = cfg.apply_overrides(["field_.encoding=hashgrid"])
    with pytest.raises(ValueError, match="triplane"):
        _tri_stage_plan(bad)


def test_run_training_progressive(tmp_path):
    """End-to-end staged run: final checkpoint is at the FINAL
    resolution, loss decreases, and a stale-checkpoint dir without
    resume is rejected."""
    import json

    from tnerf.train_loop import run_training
    from tnerf.utils.checkpoint import latest_checkpoint

    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "field_.encoding=triplane", "field_.tri_resolution=16",
        "field_.tri_init_resolution=6",
        "field_.tri_upsample_steps=[10, 20]",
        "field_.tri_features=4", "field_.tri_hidden_width=32",
        "field_.tri_hidden_layers=2",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=256", "train.steps=30", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=10",
        f"logging.out_dir={tmp_path}",
        "render.chunk_size=1024",
    ])
    metrics = run_training(cfg, datasets=scene)
    assert "psnr_test" in metrics and np.isfinite(metrics["psnr_test"])
    step, path = latest_checkpoint(f"{tmp_path}/checkpoints")
    assert step == 30
    with np.load(path) as data:
        shapes = [data[f] .shape for f in data.files]
    assert (3, 16 * 16, 4) in shapes  # final-R planes live in the ckpt
    assert (3, 6 * 6, 4) not in shapes
    lines = [json.loads(l) for l in open(f"{tmp_path}/metrics.jsonl")]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # provenance records the PROGRESSIVE config, not a stage config
    prov = json.loads(open(f"{tmp_path}/config.json").read())
    assert prov["field_"]["tri_upsample_steps"] == [10, 20]
    # a fresh (resume=false) progressive run over this dir must refuse
    with pytest.raises(ValueError, match="resume"):
        run_training(cfg, datasets=scene)
    # resume=true continues (everything done -> final eval only)
    m2 = run_training(
        cfg.apply_overrides(["train.resume=true"]), datasets=scene
    )
    assert np.isfinite(m2["psnr_test"])


def test_progressive_resume_mid_crash_window(tmp_path):
    """A checkpoint left at a milestone step at the OLD resolution (crash
    between stage end and the upsample rewrite) is detected by shape and
    upsampled before the next stage runs."""
    from tnerf.train_loop import _run_training_single, run_training
    from tnerf.utils.checkpoint import latest_checkpoint

    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "field_.encoding=triplane", "field_.tri_resolution=16",
        "field_.tri_init_resolution=6",
        "field_.tri_upsample_steps=[10]",
        "field_.tri_features=4", "field_.tri_hidden_width=32",
        "field_.tri_hidden_layers=2",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=256", "train.steps=20", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=10",
        f"logging.out_dir={tmp_path}",
        "render.chunk_size=1024",
    ])
    # run ONLY stage 0 by training the stage config directly (simulates
    # the crash window: milestone-step checkpoint still at R=6)
    stage0 = cfg.apply_overrides([
        "field_.tri_resolution=6", "field_.tri_upsample_steps=[]",
        "field_.tri_init_resolution=0", "train.steps=10",
    ])
    _run_training_single(stage0, datasets=scene)
    step, path = latest_checkpoint(f"{tmp_path}/checkpoints")
    assert step == 10
    with np.load(path) as data:
        assert (3, 36, 4) in [data[f].shape for f in data.files]
    # progressive resume picks it up, upsamples, finishes stage 1
    metrics = run_training(
        cfg.apply_overrides(["train.resume=true"]), datasets=scene
    )
    assert np.isfinite(metrics["psnr_test"])
    step, path = latest_checkpoint(f"{tmp_path}/checkpoints")
    assert step == 20
    with np.load(path) as data:
        shapes = [data[f].shape for f in data.files]
    assert (3, 256, 4) in shapes


def test_tri_stage_plan_strictly_increasing_ladder():
    """Log-linear rounding collisions are bumped into a strictly
    increasing ladder (shape-based resume matching must be unambiguous),
    and more stages than distinct resolutions is rejected."""
    from tnerf.train_loop import _tri_stage_plan

    cfg = Config().apply_overrides([
        "field_.encoding=triplane", "field_.tri_resolution=20",
        "field_.tri_init_resolution=16",
        "field_.tri_upsample_steps=[100, 200, 300]", "train.steps=500",
    ])
    res = [r for _, r in _tri_stage_plan(cfg)]
    assert res[0] == 16 and res[-1] == 20
    assert all(b > a for a, b in zip(res, res[1:])), res

    bad = cfg.apply_overrides(["field_.tri_resolution=18"])
    with pytest.raises(ValueError, match="distinct"):
        _tri_stage_plan(bad)
