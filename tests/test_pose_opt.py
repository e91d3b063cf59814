"""Camera-pose refinement (train.optimize_poses): the SE(3) exponential
against the scipy expm oracle, the meta-batch path's parity with the
standard ray batch, validation of gradient-free configurations, and
end-to-end recovery of known pose perturbations."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.cameras import compose_pose, pixel_rays, se3_exp
from tnerf.config import Config
from tnerf.data.procedural import generate_procedural_scene
from tnerf.train import PixelSampler, PoseBatch, RayBatch


def test_se3_exp_matches_scipy_expm():
    from scipy.linalg import expm

    rng = np.random.RandomState(0)
    for scale in (1.0, 1e-2, 1e-5, 0.0):
        d = (rng.randn(6) * scale).astype(np.float32)
        got = np.asarray(se3_exp(jnp.asarray(d)))
        w, v = d[:3], d[3:]
        tw = np.zeros((4, 4))
        tw[:3, :3] = [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
        tw[:3, 3] = v
        np.testing.assert_allclose(got, expm(tw), atol=1e-6)


def test_se3_exp_inverse_and_grad_at_zero():
    d = (np.random.RandomState(1).randn(4, 6) * 0.3).astype(np.float32)
    ident = np.asarray(
        compose_pose(se3_exp(jnp.asarray(d)), se3_exp(jnp.asarray(-d)))
    )
    np.testing.assert_allclose(
        ident, np.broadcast_to(np.eye(4), ident.shape), atol=1e-6
    )
    # pose params START at zero: gradients must be finite there
    g = jax.grad(lambda x: se3_exp(x).sum())(jnp.zeros(6))
    assert bool(jnp.isfinite(g).all())


def test_meta_batch_parity_with_ray_batch():
    """PoseBatch + zero deltas regenerates exactly the rays the standard
    RayBatch path produced (same pixels, same poses)."""
    scene = generate_procedural_scene(
        width=16, height=16, n_train=3, n_val=1, n_test=1, n_samples=32
    )
    s = PixelSampler(scene["train"], scene_scale=1.0, white_background=True)
    key = jax.random.PRNGKey(7)
    rb: RayBatch = s.sample(key, 64)
    pb: PoseBatch = s.sample(key, 64, meta=True)
    np.testing.assert_array_equal(np.asarray(rb.gt_rgb), np.asarray(pb.gt_rgb))
    delta = se3_exp(jnp.zeros((len(scene["train"]), 6))[pb.img])
    rays = pixel_rays(
        compose_pose(delta, s.poses[pb.img]), pb.pix, s.width, s.height,
        s.camera, s.scene_scale,
    )
    np.testing.assert_allclose(
        np.asarray(rays.origins), np.asarray(rb.rays.origins), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rays.directions), np.asarray(rb.rays.directions), atol=1e-6
    )


@pytest.mark.parametrize(
    "overrides, match",
    [
        (["render.pipeline=fused"], "fused"),
        (
            ["render.pipeline=grid_march", "field_.encoding=hashgrid",
             "field_.hash_gather_mode=onehot"],
            "hash_gather_mode=gather",
        ),
        (
            ["render.pipeline=grid_march", "field_.encoding=triplane",
             "field_.tri_gather_mode=onehot"],
            "tri_gather_mode=gather",
        ),
    ],
)
def test_pose_opt_validates_gradient_free_configs(tmp_path, overrides, match):
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=16, height=16, n_train=2, n_val=1, n_test=1, n_samples=32
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "train.optimize_poses=true",
        "train.steps=2", f"logging.out_dir={tmp_path}",
    ] + overrides)
    with pytest.raises(ValueError, match=match):
        run_training(cfg, datasets=scene)


@pytest.mark.slow  # ~5.6 min: the quality-recovery assertion needs 800
# steps; the fast tier keeps functional pose-opt coverage via
# test_pose_opt_composes_with_dp / _with_cdf_compaction_switch / etc.
def test_pose_refinement_recovers_perturbation(tmp_path):
    """Perturb the training poses by known SE(3) deltas: with
    optimize_poses the deltas must move and test PSNR must beat the
    unrefined run on the same corrupted data (measured +1.8 dB at this
    configuration; the deltas compensate the perturbation in the
    photometric sense — metric-exact pose recovery needs BARF-style
    frequency annealing, which full-frequency encodings famously lack).
    A CLI eval then restores the pose-opt checkpoint (the template
    carries the delta leaf)."""
    from tnerf.cli import main
    from tnerf.grid.occupancy import init_occupancy
    from tnerf.train import create_optimizer, init_train_state, pose_extra_params
    from tnerf.train_loop import build_field, run_training
    from tnerf.utils.checkpoint import restore_checkpoint

    n_train = 8
    scene = generate_procedural_scene(
        width=48, height=48, n_train=n_train, n_val=1, n_test=2, n_samples=96
    )
    rng = np.random.RandomState(3)
    true_d = np.zeros((n_train, 6), np.float32)
    true_d[:, :3] = rng.randn(n_train, 3) * 0.05  # ~2.9 deg rotations
    true_d[:, 3:] = rng.randn(n_train, 3) * 0.08
    pert = np.asarray(se3_exp(jnp.asarray(true_d)))
    tr = scene["train"]
    pert_poses = np.einsum("nij,njk->nik", pert, tr.poses).astype(np.float32)
    corrupted = dict(scene)
    corrupted["train"] = dataclasses.replace(tr, poses=pert_poses)

    base = [
        "scene.kind=procedural", "scene.name=prims", "scene.scene_scale=1.0",
        "scene.proc_width=48", "scene.proc_height=48",
        f"scene.proc_n_train={n_train}", "scene.proc_n_val=1",
        "scene.proc_n_test=2", "scene.proc_n_samples=96",
        "render.pipeline=grid_march",
        "grid.resolution=16", "grid.warmup_steps=20", "grid.update_every=10",
        "sampler.samples_per_ray=48", "sampler.near=2.0", "sampler.far=5.5",
        "field_.n_frequencies=6", "field_.hidden_width=64",
        "field_.hidden_layers=3",
        "train.batch_size=1024", "train.steps=800", "train.eval_every=0",
        "train.checkpoint_every=800", "train.log_every=400",
        "render.chunk_size=4096",
    ]
    out_ref = str(tmp_path / "no_opt")
    m_ref = run_training(
        Config().apply_overrides(base + [f"logging.out_dir={out_ref}"]),
        datasets=dict(corrupted),
    )
    out = str(tmp_path / "opt")
    cfg = Config().apply_overrides(base + [
        f"logging.out_dir={out}", "train.optimize_poses=true",
    ])
    m = run_training(cfg, datasets=dict(corrupted))
    assert m["psnr_test"] > m_ref["psnr_test"] + 0.5

    field = build_field(cfg)
    opt = create_optimizer(cfg.train)
    st = init_train_state(
        field, opt, cfg.train.seed, pose_extra_params(cfg, n_train)
    )
    occ = init_occupancy(cfg.grid)
    _, (st, occ) = restore_checkpoint(f"{out}/checkpoints", (st, occ))
    learned = np.asarray(st.params["pose_deltas"])
    assert np.linalg.norm(learned, axis=1).mean() > 1e-3  # it moved

    # CLI eval restores the pose-opt checkpoint (the restore template
    # must carry the [N, 6] delta leaf + its Adam mirrors)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        fh.write(cfg.to_json())
    rc = main(["eval", "--config", cfg_path, "--checkpoint", f"{out}/checkpoints"])
    assert rc == 0


def test_pose_opt_composes_with_dp(tmp_path):
    """optimize_poses under data parallelism: the PoseBatch shards over
    the ray axis and the delta gradients all-reduce like any param."""
    from tnerf.train_loop import run_training

    assert len(jax.devices()) >= 2
    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.n_frequencies=4", "field_.hidden_width=32",
        "field_.hidden_layers=2",
        "parallel.data_parallel=2",
        "train.optimize_poses=true", "train.pose_lr_mult=0.5",
        "train.batch_size=256", "train.steps=10", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=5",
        f"logging.out_dir={tmp_path}", "render.chunk_size=1024",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])


# ---- BARF coarse-to-fine frequency annealing ---------------------------------


def test_barf_window_semantics():
    from tnerf.fields.encodings import barf_window, frequency_encoding

    L = 6
    assert np.allclose(np.asarray(barf_window(jnp.asarray(0.0), L)), 0.0)
    assert np.allclose(np.asarray(barf_window(jnp.asarray(1.0), L)), 1.0)
    w_half = np.asarray(barf_window(jnp.asarray(0.5), L))
    assert np.allclose(w_half[:3], 1.0) and np.allclose(w_half[3:], 0.0)
    # monotone in alpha, per band
    ws = np.stack([
        np.asarray(barf_window(jnp.asarray(a), L))
        for a in np.linspace(0, 1, 11)
    ])
    assert (np.diff(ws, axis=0) >= -1e-7).all()
    # window of ones == unwindowed; zero window keeps only the raw input
    x = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    full = frequency_encoding(x, L)
    np.testing.assert_array_equal(
        np.asarray(frequency_encoding(x, L, window=jnp.ones(L))),
        np.asarray(full),
    )
    zeroed = np.asarray(frequency_encoding(x, L, window=jnp.zeros(L)))
    np.testing.assert_array_equal(zeroed[:, :3], np.asarray(x))
    assert np.allclose(zeroed[:, 3:], 0.0)


def test_freq_anneal_end_to_end_and_validation(tmp_path):
    """run_training with freq_anneal_steps: the checkpoint carries the
    schedule leaf at its final value (1.0 past the anneal window), and
    the step-0 field genuinely starts coarse (only the raw-input columns
    of the encoding are live).  Grid encodings and the fused pipeline
    are rejected."""
    from tnerf.grid.occupancy import init_occupancy
    from tnerf.train import create_optimizer, init_train_state, pose_extra_params
    from tnerf.train_loop import build_field, run_training
    from tnerf.utils.checkpoint import restore_checkpoint

    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    out = str(tmp_path / "anneal")
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.n_frequencies=4", "field_.hidden_width=32",
        "field_.hidden_layers=2",
        "train.freq_anneal_steps=10",
        "train.batch_size=256", "train.steps=20", "train.eval_every=0",
        "train.checkpoint_every=20", "train.log_every=10",
        f"logging.out_dir={out}", "render.chunk_size=1024",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])
    field = build_field(cfg)
    opt = create_optimizer(cfg.train)
    st = init_train_state(field, opt, cfg.train.seed, pose_extra_params(cfg, 4))
    occ = init_occupancy(cfg.grid)
    _, (st, occ) = restore_checkpoint(f"{out}/checkpoints", (st, occ))
    assert float(st.params["freq_alpha"]) == 1.0

    # alpha=0 params: the encoding's band columns are dead, raw passes
    p0 = {**st.params, "freq_alpha": jnp.zeros(())}
    x = jnp.asarray([[0.3, -0.2, 0.5]])
    w0 = field._freq_window(p0)
    assert np.allclose(np.asarray(w0), 0.0)

    for bad, match in [
        (["field_.encoding=hashgrid"], "frequency"),
        (["render.pipeline=fused"], "fused"),
    ]:
        c = cfg.apply_overrides(bad + [f"logging.out_dir={tmp_path}/b"])
        with pytest.raises(ValueError, match=match):
            run_training(c, datasets=scene)


def test_pose_opt_with_cdf_compaction_switch(tmp_path):
    """optimize_poses + CDF placement + compaction: the occupancy-switch
    probe must regenerate rays from the PoseBatch (which has no .rays)
    instead of crashing at the first post-warmup update."""
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "sampler.placement=density_cdf", "sampler.cdf_bins=16",
        "render.compact=true", "render.compact_fraction=0.9",
        "field_.n_frequencies=4", "field_.hidden_width=32",
        "field_.hidden_layers=2",
        "train.optimize_poses=true",
        "train.batch_size=256", "train.steps=12", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=5",
        f"logging.out_dir={tmp_path}", "render.chunk_size=1024",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])


def test_pose_opt_rejected_with_progressive_triplane(tmp_path):
    """The combination must fail at CONFIG time (in the stage planner —
    per-stage validation never sees tri_upsample_steps)."""
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=16, height=16, n_train=2, n_val=1, n_test=1, n_samples=32
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "render.pipeline=grid_march",
        "field_.encoding=triplane", "field_.tri_gather_mode=gather",
        "field_.tri_resolution=16", "field_.tri_init_resolution=6",
        "field_.tri_upsample_steps=[5]",
        "train.optimize_poses=true", "train.steps=10",
        f"logging.out_dir={tmp_path}",
    ])
    with pytest.raises(ValueError, match="progressive"):
        run_training(cfg, datasets=scene)


def test_freq_alpha_exact_under_adamw():
    """With weight_decay > 0 (adamw) the schedule leaf must still be
    written back as EXACTLY this step's alpha (decoupled decay would
    otherwise shave it every step)."""
    from types import SimpleNamespace

    from tnerf.cameras import Rays
    from tnerf.config import TrainConfig
    from tnerf.train import RayBatch, TrainState, create_optimizer, make_train_step

    params = {
        "trunk": {"w": jnp.ones((2, 2))},
        "freq_alpha": jnp.zeros(()),
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
    opt = create_optimizer(
        TrainConfig(skip_nonfinite=False, weight_decay=0.1)
    )
    step = make_train_step(fake_renderer, opt, freq_anneal=10)
    st = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    for k in range(3):
        st, _ = step(st, batch, jax.random.PRNGKey(k))
        want = min(float(st.step - 1) / 10.0, 1.0)
        # f32 representation only — decoupled decay would shave ~lr*wd
        # (1e-4 here), far above this tolerance
        assert abs(float(st.params["freq_alpha"]) - want) < 1e-7, (
            k, st.params["freq_alpha"],
        )


def test_pose_opt_with_epoch_shuffle(tmp_path):
    """optimize_poses under shuffle=epoch: the permutation sampler's
    meta path feeds PoseBatches too."""
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=16, height=16, n_train=3, n_val=1, n_test=1, n_samples=32
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.n_frequencies=4", "field_.hidden_width=32",
        "field_.hidden_layers=2",
        "train.optimize_poses=true", "train.shuffle=epoch",
        "train.batch_size=128", "train.steps=8", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=4",
        f"logging.out_dir={tmp_path}", "render.chunk_size=1024",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])


def test_cli_render_refined_poses(tmp_path):
    """`cli render --refined-poses` applies the checkpoint's learned
    delta to a TRAIN view and rejects misuse (test split, non-pose
    checkpoint)."""
    from tnerf.cli import main
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=16, height=16, n_train=3, n_val=1, n_test=1, n_samples=32
    )
    out = str(tmp_path / "run")
    overrides = [
        "scene.kind=procedural", "scene.name=prims", "scene.scene_scale=1.0",
        "scene.proc_width=16", "scene.proc_height=16",
        "scene.proc_n_train=3", "scene.proc_n_val=1", "scene.proc_n_test=1",
        "scene.proc_n_samples=32",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.n_frequencies=4", "field_.hidden_width=32",
        "field_.hidden_layers=2",
        "train.optimize_poses=true",
        "train.batch_size=128", "train.steps=10", "train.eval_every=0",
        "train.checkpoint_every=10", "train.log_every=5",
        f"logging.out_dir={out}", "render.chunk_size=512",
    ]
    cfg = Config().apply_overrides(overrides)
    run_training(cfg, datasets=scene)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        fh.write(cfg.to_json())
    png = str(tmp_path / "train0.png")
    rc = main([
        "render", "--config", cfg_path, "--checkpoint", f"{out}/checkpoints",
        "--split", "train", "--pose-index", "0", "--refined-poses",
        "--out", png,
    ])
    assert rc == 0
    import os
    assert os.path.exists(png)
    # test split rejected
    rc = main([
        "render", "--config", cfg_path, "--checkpoint", f"{out}/checkpoints",
        "--split", "test", "--pose-index", "0", "--refined-poses",
        "--out", str(tmp_path / "x.png"),
    ])
    assert rc == 1
