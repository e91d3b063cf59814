"""End-to-end training slice (BASELINE config 1 shape, tiny): procedural
scene -> uniform-sampling renderer -> L2 + Adam -> PSNR must improve
substantially. This is the regression anchor for everything after
(SURVEY §7.2 M1)."""

import jax
import numpy as np
import pytest

from tnerf.config import Config
from tnerf.data.procedural import generate_procedural_scene
from tnerf.eval import evaluate
from tnerf.fields.nerf_field import NeRFField
from tnerf.render.renderer import make_uniform_renderer
from tnerf.train import (
    PixelSampler,
    create_optimizer,
    init_train_state,
    make_train_step,
)


@pytest.fixture(scope="module")
def cfg():
    return Config().apply_overrides([
        "sampler.samples_per_ray=48",
        "sampler.near=2.0",
        "sampler.far=5.5",
        "field_.hidden_width=64",
        "field_.hidden_layers=3",
        "field_.n_frequencies=6",
        "train.batch_size=512",
        "scene.scene_scale=1.0",
    ])


@pytest.fixture(scope="module")
def scene():
    return generate_procedural_scene(
        width=40, height=40, n_train=8, n_val=0, n_test=2, n_samples=128
    )


def test_train_slice_improves_psnr(cfg, scene):
    field = NeRFField(cfg.field_, cfg.grid)
    renderer = make_uniform_renderer(field, cfg.sampler, cfg.render)
    optimizer = create_optimizer(cfg.train)
    state = init_train_state(field, optimizer, cfg.train.seed)
    sampler = PixelSampler(scene["train"], cfg.scene.scene_scale, True)
    train_step = make_train_step(renderer, optimizer)

    key = jax.random.PRNGKey(0)
    first_loss, last_loss = None, None
    for step in range(250):
        key, k1, k2 = jax.random.split(key, 3)
        batch = sampler.sample(k1, cfg.train.batch_size)
        state, aux = train_step(state, batch, k2)
        if step == 0:
            first_loss = float(aux["loss"])
        last_loss = float(aux["loss"])

    assert np.isfinite(last_loss)
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)

    metrics = evaluate(
        renderer, state.params, scene["test"], cfg.scene.scene_scale,
        chunk_size=2048,
    )
    # 250 tiny steps won't be pretty, but must beat the all-white baseline
    # by a clear margin (white-vs-GT on this scene is ~10-12 dB)
    assert metrics["psnr_test"] > 14.0, metrics


def test_train_step_handles_nonfinite(cfg, scene):
    """skip_nonfinite: a poisoned batch must not corrupt params."""
    import jax.numpy as jnp

    field = NeRFField(cfg.field_, cfg.grid)
    renderer = make_uniform_renderer(field, cfg.sampler, cfg.render)
    optimizer = create_optimizer(cfg.train)
    state = init_train_state(field, optimizer, cfg.train.seed)
    sampler = PixelSampler(scene["train"], cfg.scene.scene_scale, True)
    train_step = make_train_step(renderer, optimizer)
    key = jax.random.PRNGKey(1)
    batch = sampler.sample(key, cfg.train.batch_size)
    poisoned = batch._replace(gt_rgb=batch.gt_rgb.at[0, 0].set(jnp.nan))
    state2, aux = train_step(state, poisoned, key)
    # params unchanged (apply_if_finite skipped the update)
    leaves = jax.tree.leaves(
        jax.tree.map(lambda a, b: jnp.allclose(a, b), state.params, state2.params)
    )
    assert all(bool(x) for x in leaves)


def test_photometric_loss_forms():
    """Closed-form checks of the three loss kinds + early typo rejection."""
    from tnerf.train import photometric_loss

    err = np.array([[0.0, 0.05, -0.2]], np.float32)
    l2 = float(photometric_loss(err, "l2"))
    l1 = float(photometric_loss(err, "l1"))
    hu = float(photometric_loss(err, "huber", huber_delta=0.1))
    assert l2 == pytest.approx(np.mean(err ** 2))
    assert l1 == pytest.approx(np.mean(np.abs(err)))
    # huber: 0 -> 0; 0.05 (<= delta) -> 0.5*0.05^2; 0.2 (> delta) ->
    # 0.1*(0.2 - 0.05)
    assert hu == pytest.approx((0.0 + 0.5 * 0.05 ** 2 + 0.1 * 0.15) / 3)
    # beyond-delta gradient magnitude is the constant delta (robustness)
    g = jax.grad(lambda e: photometric_loss(e, "huber", 0.1))(
        np.array([[0.5, -0.5, 0.0]], np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(g)[0, :2], [0.1 / 3, -0.1 / 3], rtol=1e-6
    )
    with pytest.raises(ValueError, match="l2, l1 or huber"):
        photometric_loss(err, "l3")
    with pytest.raises(ValueError, match="l2, l1 or huber"):
        make_train_step(lambda *a: None, create_optimizer(Config().train),
                        loss="charbonnier")


def test_train_slice_huber_improves_psnr(cfg, scene):
    """The huber objective trains (PSNR aux reported from MSE rises)."""
    field = NeRFField(cfg.field_, cfg.grid)
    optimizer = create_optimizer(cfg.train)
    state = init_train_state(field, optimizer, cfg.train.seed)
    renderer = make_uniform_renderer(field, cfg.sampler, cfg.render)
    step = make_train_step(renderer, optimizer, loss="huber",
                           huber_delta=0.1)
    sampler = PixelSampler(scene["train"], cfg.scene.scene_scale,
                           cfg.scene.white_background)
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(60):
        key, k1, k2 = jax.random.split(key, 3)
        batch = sampler.sample(k1, cfg.train.batch_size)
        state, aux = step(state, batch, k2)
        if first is None:
            first = float(aux["psnr"])
    assert float(aux["psnr"]) > first + 4.0


def test_training_is_deterministic(tmp_path):
    """Two runs with the same seed must produce IDENTICAL final metrics
    (threefry RNG, on-device batching, occupancy updates — the whole
    loop is reproducible; wall-clock metrics excluded)."""
    import numpy as np

    from tnerf.config import Config
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    outs = []
    for tag in ("a", "b"):
        scene = generate_procedural_scene(
            width=24, height=24, n_train=3, n_val=1, n_test=1, n_samples=64
        )
        cfg = Config().apply_overrides([
            "scene.kind=procedural", "scene.scene_scale=1.0",
            "render.pipeline=grid_march",
            "sampler.samples_per_ray=16", "sampler.mode=stratified",
            "sampler.near=2.0", "sampler.far=5.5",
            "field_.hidden_width=16", "field_.hidden_layers=1",
            "field_.n_frequencies=2",
            "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
            "train.batch_size=128", "train.steps=20", "train.eval_every=0",
            "train.checkpoint_every=0", "train.log_every=10",
            f"logging.out_dir={tmp_path / tag}", "render.chunk_size=576",
        ])
        outs.append(run_training(cfg, datasets=scene))
    a, b = outs
    for k in a:
        if k.startswith(("psnr", "ssim")):
            assert a[k] == b[k], (k, a[k], b[k])
    assert np.isfinite(a["psnr_test"])


@pytest.mark.slow  # ~3.7 min (subprocess pays full compile for train +
# eval + keep-best + depth renders); the same API surface is covered on
# the fast tier by test_train_loop / test_eval_outputs / test_golden.
def test_example_script_runs(tmp_path):
    """examples/train_and_render.py (the documented library-usage entry
    point) runs end-to-end and writes the view + depth PNGs."""
    import os
    import subprocess
    import sys as _sys

    out = tmp_path / "ex"
    env = dict(os.environ)
    # the subprocess needs the repo importable; APPEND (never replace —
    # a bare PYTHONPATH would drop the TPU plugin path when run there)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [_sys.executable, "examples/train_and_render.py", str(out), "12"],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (out / "example_view.png").exists()
    assert (out / "example_depth.png").exists()
    assert (out / "config.json").exists()
