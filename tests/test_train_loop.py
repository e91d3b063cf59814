"""Integration: run_training end-to-end with the grid pipeline —
occupancy updates, metrics JSONL, checkpoint/resume, render output."""

import json
import os

import numpy as np
import pytest

from tnerf.config import Config
from tnerf.data.procedural import generate_procedural_scene
from tnerf.train_loop import run_training
from tnerf.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def scene():
    return generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )


def _cfg(tmp, **extra):
    ov = [
        "scene.kind=procedural", "scene.scene_scale=1.0",
        # grid_march: these tests target the XLA pipeline; the fused
        # default would run interpreted (slow) on CPU and is covered by
        # test_pallas_fused2/test_distributed.
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=256", "train.steps=40", "train.eval_every=0",
        "train.checkpoint_every=20", "train.log_every=10",
        f"logging.out_dir={tmp}",
        "render.chunk_size=1024",
    ]
    ov += extra.get("ov", [])
    return Config().apply_overrides(ov)


def test_run_training_grid_pipeline(tmp_path, scene):
    cfg = _cfg(str(tmp_path / "run"))
    metrics = run_training(cfg, datasets=scene)
    assert "psnr_test" in metrics and np.isfinite(metrics["psnr_test"])
    # metrics JSONL written
    mpath = tmp_path / "run" / "metrics.jsonl"
    lines = [json.loads(l) for l in open(mpath)]
    assert any("loss" in l for l in lines)
    assert any("occupancy_frac" in l for l in lines)
    # final render images exist
    renders = tmp_path / "run" / "renders_40"
    assert renders.exists() and len(list(renders.iterdir())) >= 1
    # checkpoints exist
    found = latest_checkpoint(str(tmp_path / "run" / "checkpoints"))
    assert found is not None and found[0] == 40


def test_resume_from_checkpoint(tmp_path, scene):
    out = str(tmp_path / "resume_run")
    cfg = _cfg(out)
    run_training(cfg, datasets=scene)
    # resume: continue 10 more steps from step 40
    cfg2 = cfg.apply_overrides(["train.resume=true", "train.steps=50"])
    metrics = run_training(cfg2, datasets=scene)
    assert np.isfinite(metrics["psnr_test"])
    found = latest_checkpoint(os.path.join(out, "checkpoints"))
    assert found[0] == 50


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    state = {"a": jnp.arange(5.0), "b": [jnp.ones((2, 2)), jnp.zeros(3)]}
    save_checkpoint(str(tmp_path), 7, state)
    step, restored = restore_checkpoint(str(tmp_path), state)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(5.0))
    # mismatched template errors clearly
    with pytest.raises(ValueError):
        restore_checkpoint(str(tmp_path), {"a": jnp.zeros(5)})


def test_ssim_metric_sanity():
    from tnerf.eval import ssim

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    assert abs(ssim(img, img) - 1.0) < 1e-6
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    s = ssim(noisy, img)
    assert 0.0 < s < 0.9
    # smooth image pair more similar than noise pair
    a = np.tile(np.linspace(0, 1, 48)[:, None, None], (1, 48, 3)).astype(np.float32)
    b = np.clip(a + 0.02, 0, 1)
    assert ssim(a, b) > s


def test_run_training_intervals_pipeline(tmp_path, scene):
    """The reference-parity pipeline (grid_intervals + 32/interval) must
    train end-to-end too."""
    cfg = _cfg(str(tmp_path / "ivrun"), ov=[]).apply_overrides([
        "render.pipeline=grid_intervals",
        "sampler.samples_per_interval=4",
        "grid.resolution=4",
        "train.steps=25", "train.checkpoint_every=0", "train.log_every=10",
    ])
    metrics = run_training(cfg, datasets=scene)
    assert np.isfinite(metrics["psnr_test"])


def test_metrics_writer(tmp_path):
    from tnerf.utils.metrics import MetricsWriter, step_timer

    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write(0, loss=0.5, tag="a")
    w.write(10, loss=np.float32(0.25))
    w.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 0.5 and lines[0]["tag"] == "a"
    assert lines[1]["loss"] == 0.25
    # disabled writer is a no-op
    w2 = MetricsWriter(None)
    w2.write(0, loss=1.0)
    w2.close()
    with step_timer() as t:
        sum(range(1000))
    assert t.seconds >= 0


def test_epoch_sampler_covers_all_pixels_once():
    """sample_epoch over one epoch must touch every pixel exactly once
    (the reference's shuffle semantics, without D11's overrun) — asserted
    on the SAMPLED BATCHES: every pixel's GT color uniquely encodes its
    (image, y, x) identity, so coverage is read back from what the
    sampler actually gathered, not re-derived from the index math."""
    import jax
    import jax.numpy as jnp

    from tnerf.data.dataset import ImageDataset
    from tnerf.train import PixelSampler

    n_img, H, W = 2, 8, 8
    imgs = np.zeros((n_img, H, W, 3), np.float32)
    n_idx, y_idx, x_idx = np.meshgrid(
        np.arange(n_img), np.arange(H), np.arange(W), indexing="ij"
    )
    imgs[..., 0] = n_idx / (n_img - 1)
    imgs[..., 1] = y_idx / (H - 1)
    imgs[..., 2] = x_idx / (W - 1)
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (n_img, 1, 1))
    ds = ImageDataset(images=imgs, poses=poses, focal=8.0, width=W, height=H,
                      channels=3)
    sampler = PixelSampler(ds, 1.0, True)
    total = n_img * H * W
    B = 32
    key = jax.random.PRNGKey(0)
    seen = []
    for i in range(total // B):
        batch = sampler.sample_epoch(key, jnp.asarray(i), B)
        gt = np.asarray(batch.gt_rgb)
        n = np.rint(gt[:, 0] * (n_img - 1)).astype(int)
        y = np.rint(gt[:, 1] * (H - 1)).astype(int)
        x = np.rint(gt[:, 2] * (W - 1)).astype(int)
        seen.append((n * H + y) * W + x)
    flat = np.concatenate(seen)
    assert flat.shape[0] == total
    assert len(np.unique(flat)) == total  # every pixel exactly once


def test_run_training_data_parallel(tmp_path, scene):
    """run_training itself on the 8-device CPU mesh: ParallelConfig consumed
    end-to-end (sharded batches, replicated params, DP eval rendering)."""
    import jax

    assert len(jax.devices()) >= 8
    cfg = _cfg(str(tmp_path / "dp_run")).apply_overrides([
        "parallel.data_parallel=8",
        "train.steps=20", "train.eval_every=10", "train.checkpoint_every=20",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])
    found = latest_checkpoint(str(tmp_path / "dp_run" / "checkpoints"))
    assert found is not None and found[0] == 20


def test_run_training_dp_rejects_indivisible_batch(tmp_path, scene):
    cfg = _cfg(str(tmp_path / "dp_bad")).apply_overrides([
        "parallel.data_parallel=8", "train.batch_size=250",
    ])
    with pytest.raises(ValueError, match="not divisible"):
        run_training(cfg, datasets=scene)


def test_epoch_training_mode_runs(tmp_path, scene):
    cfg = _cfg(str(tmp_path / "epoch_run")).apply_overrides([
        "train.shuffle=epoch", "train.steps=12", "train.checkpoint_every=0",
        "train.eval_every=0",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])


def test_hard_scene_training_improves(tmp_path):
    """Smoke gate on the HARD scene (thin rods, hi-freq texture, black
    background): the grid pipeline + occupancy updates must train
    end-to-end and improve PSNR.  The full >=30 dB acceptance runs on
    TPU via configs/procedural_hard_30db.json (metrics committed under
    runs/)."""
    from tnerf.data.procedural import generate_procedural_scene

    scene = generate_procedural_scene(
        "hard", width=24, height=24, n_train=3, n_val=0, n_test=1, n_samples=768
    )
    cfg = _cfg(str(tmp_path / "hard"), ov=[
        "scene.name=hard", "scene.white_background=false",
        "render.white_background=false",
        "sampler.samples_per_ray=64", "train.steps=60",
        "train.checkpoint_every=0", "train.log_every=20",
        "field_.n_frequencies=6", "field_.hidden_width=64",
    ]).apply_overrides([])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])
    # improvement over the first logged loss
    import json as _json
    lines = [_json.loads(l) for l in open(tmp_path / "hard" / "metrics.jsonl")]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert losses[-1] < losses[0] * 0.7


def test_run_training_sample_parallel(tmp_path, scene):
    """run_training with the sample axis sharded: ParallelConfig
    sample_parallel consumed end-to-end on a ("data", "sample") mesh."""
    import jax

    assert len(jax.devices()) >= 8
    cfg = _cfg(str(tmp_path / "sp_run")).apply_overrides([
        "render.pipeline=grid_intervals",
        "grid.max_hits=8", "sampler.samples_per_interval=4",
        "parallel.data_parallel=2", "parallel.sample_parallel=4",
        "train.steps=12", "train.eval_every=6", "train.checkpoint_every=0",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])


def test_run_training_table_parallel(tmp_path, scene):
    """run_training with hash-grid tables level-sharded: ParallelConfig
    table_parallel consumed end-to-end on a ("data", "model") mesh."""
    import jax

    assert len(jax.devices()) >= 8
    cfg = _cfg(str(tmp_path / "tp_run")).apply_overrides([
        "field_.encoding=hashgrid", "field_.hash_levels=8",
        "field_.hash_log2_table_size=12", "field_.hash_max_resolution=64",
        "field_.hash_gather_mode=gather",
        "parallel.data_parallel=2", "parallel.table_parallel=4",
        "train.steps=12", "train.eval_every=6", "train.checkpoint_every=0",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])


def test_run_training_sp_requires_intervals(tmp_path, scene):
    cfg = _cfg(str(tmp_path / "sp_bad")).apply_overrides([
        "parallel.sample_parallel=4",
    ])
    with pytest.raises(ValueError, match="grid_intervals"):
        run_training(cfg, datasets=scene)


def test_acceptance_gate_raises_on_low_min_view():
    """train.assert_test_psnr_min: an undertrained run must fail the
    gate AFTER saving its checkpoint and metrics."""
    import os
    import tempfile

    import pytest

    from tnerf.config import Config
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=16, height=16, n_train=2, n_val=0, n_test=1, n_samples=32
    )
    with tempfile.TemporaryDirectory() as tmp:
        cfg = Config().apply_overrides([
            "field_.hidden_width=16", "field_.hidden_layers=2",
            "field_.n_frequencies=2", "sampler.samples_per_ray=8",
            "grid.resolution=8", "train.batch_size=64", "train.steps=2",
            "train.eval_every=0", "train.checkpoint_every=0",
            "train.log_every=1", "train.assert_test_psnr_min=30",
            "render.chunk_size=256", f"logging.out_dir={tmp}",
        ])
        with pytest.raises(RuntimeError, match="acceptance gate"):
            run_training(cfg, datasets=scene)
        # evidence survives the failed gate
        assert os.path.exists(os.path.join(tmp, "checkpoints"))
        assert os.path.exists(os.path.join(tmp, "metrics.jsonl"))


def test_run_dir_is_self_describing(tmp_path):
    """run_training writes the resolved config.json into the run dir;
    summarize_runs reads it back and the config reproduces the run
    settings exactly."""
    import json
    import subprocess
    import sys as _sys

    from tnerf.config import Config
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=24, height=24, n_train=2, n_val=0, n_test=1, n_samples=64
    )
    out = tmp_path / "run"
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=8", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "grid.resolution=8", "grid.warmup_steps=4", "grid.update_every=4",
        "train.batch_size=64", "train.steps=8", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=4",
        f"logging.out_dir={out}", "render.chunk_size=576",
    ])
    run_training(cfg, datasets=scene)
    assert Config.from_json_file(str(out / "config.json")) == cfg
    # the summarizer renders a row for it
    proc = subprocess.run(
        [_sys.executable, "tools/summarize_runs.py", str(out)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert "| run |" in proc.stdout and "run |" in proc.stdout
    # config column present (truncated at 90 chars, so check an early knob)
    assert "grid.resolution=8" in proc.stdout
