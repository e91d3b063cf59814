"""Training-ergonomics knobs: gradient accumulation (train.grad_accum
_steps), LR warmup (train.lr_warmup_steps), best-checkpoint keeping
(train.keep_best).

The reference has none of these (constant lr 1e-3 hardcoded at
main.cu:39-46, no checkpoints at all); they are the standard production
knobs a training framework ships.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tnerf.config import Config, TrainConfig
from tnerf.train import create_optimizer


def _allclose_tree(a, b, atol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_grad_accum_matches_big_batch():
    """k accumulation microsteps over the k equal slices of a batch must
    produce the same optimizer update as one step on the full batch
    (MultiSteps grad mean == big-batch mean-loss grad)."""
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (8, 4), jnp.float32)
    params = {"w": jnp.ones((4,), jnp.float32)}
    loss = lambda p, b: jnp.mean((b @ p["w"]) ** 2)

    cfg1 = TrainConfig(steps=10, grad_accum_steps=1)
    cfg2 = dataclasses.replace(cfg1, grad_accum_steps=2)
    opt1, opt2 = create_optimizer(cfg1), create_optimizer(cfg2)

    g = jax.grad(loss)(params, data)
    u1, _ = opt1.update(g, opt1.init(params), params)
    p_big = optax.apply_updates(params, u1)

    s2 = opt2.init(params)
    ga = jax.grad(loss)(params, data[:4])
    u, s2 = opt2.update(ga, s2, params)
    p_mid = optax.apply_updates(params, u)
    _allclose_tree(p_mid, params)  # accumulation-only step: zero update
    gb = jax.grad(loss)(params, data[4:])
    u, s2 = opt2.update(gb, s2, p_mid)
    p_acc = optax.apply_updates(p_mid, u)

    _allclose_tree(p_big, p_acc)
    # and it actually moved
    assert float(jnp.abs(p_acc["w"] - params["w"]).sum()) > 0


def test_grad_accum_nonfinite_microbatch_is_skipped():
    """apply_if_finite wraps OUTSIDE the accumulation: a NaN microbatch
    must be skipped without poisoning the accumulation window — the two
    good microbatches still produce the big-batch update."""
    key = jax.random.PRNGKey(1)
    data = jax.random.normal(key, (8, 4), jnp.float32)
    params = {"w": jnp.ones((4,), jnp.float32)}
    loss = lambda p, b: jnp.mean((b @ p["w"]) ** 2)

    cfg = TrainConfig(steps=10, grad_accum_steps=2, skip_nonfinite=True)
    opt = create_optimizer(cfg)
    s = opt.init(params)
    bad = {"w": jnp.full((4,), jnp.nan, jnp.float32)}
    u, s = opt.update(bad, s, params)
    p = optax.apply_updates(params, u)
    _allclose_tree(p, params)  # skipped entirely
    for sl in (data[:4], data[4:]):
        g = jax.grad(loss)(p, sl)
        u, s = opt.update(g, s, p)
        p = optax.apply_updates(p, u)

    cfg1 = TrainConfig(steps=10, grad_accum_steps=1)
    opt1 = create_optimizer(cfg1)
    g = jax.grad(loss)(params, data)
    u1, _ = opt1.update(g, opt1.init(params), params)
    _allclose_tree(p, optax.apply_updates(params, u1))


def test_lr_warmup_first_update_is_zero():
    """With warmup the schedule starts at lr=0: the very first optimizer
    update must leave params unchanged, and a later one must move them."""
    params = {"w": jnp.ones((4,), jnp.float32)}
    g = {"w": jnp.ones((4,), jnp.float32)}
    cfg = TrainConfig(steps=100, lr_warmup_steps=10)
    opt = create_optimizer(cfg)
    s = opt.init(params)
    u, s = opt.update(g, s, params)
    p = optax.apply_updates(params, u)
    _allclose_tree(p, params, atol=0.0)
    for _ in range(5):
        u, s = opt.update(g, s, p)
        p = optax.apply_updates(p, u)
    assert float(jnp.abs(p["w"] - params["w"]).sum()) > 0


def test_warmup_composes_with_decay_endpoint():
    """Warmup then exponential decay: the schedule must reach
    lr * lr_final_fraction at the last update, not stretch past it."""
    cfg = TrainConfig(
        steps=100, lr=1e-3, lr_warmup_steps=20, lr_final_fraction=0.1
    )
    # reconstruct the schedule exactly as create_optimizer builds it
    warm = optax.linear_schedule(0.0, cfg.lr, 20)
    decay = optax.exponential_decay(cfg.lr, transition_steps=80,
                                    decay_rate=0.1)
    sched = optax.join_schedules([warm, decay], [20])
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(20)), cfg.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), cfg.lr * 0.1, rtol=1e-2)


def test_run_training_grad_accum_and_keep_best(tmp_path):
    """End-to-end: run_training with grad accumulation + keep_best
    writes a restorable best checkpoint and finishes with finite PSNR
    (exercises the MultiSteps opt state through the jitted step, the
    checkpoint template, and the best-dir bookkeeping)."""
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training
    from tnerf.utils.checkpoint import latest_checkpoint

    scene = generate_procedural_scene(
        width=24, height=24, n_train=3, n_val=1, n_test=1, n_samples=64
    )
    out = tmp_path / "run"
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=16", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=128", "train.steps=30", "train.eval_every=10",
        "train.grad_accum_steps=2", "train.lr_warmup_steps=4",
        "train.keep_best=true",
        "train.checkpoint_every=0", "train.log_every=10",
        f"logging.out_dir={out}", "render.chunk_size=576",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])
    found = latest_checkpoint(str(out / "checkpoints_best"))
    assert found is not None
    # best_psnr recorded in the metrics stream
    import json

    best = [
        json.loads(line)
        for line in open(out / "metrics.jsonl")
        if "best_psnr" in line
    ]
    assert best and np.isfinite(best[-1]["best_psnr"])


def test_restore_best_psnr_survives_resume(tmp_path):
    """The keep_best tracker must restore from metrics.jsonl on resume:
    a fresh -inf tracker would let a worse post-resume eval overwrite
    checkpoints_best at a higher step (which latest_checkpoint then
    prefers)."""
    import json

    from tnerf.train_loop import _restore_best_psnr
    from tnerf.utils.metrics import get_logger

    out = tmp_path / "run"
    out.mkdir()
    with open(out / "metrics.jsonl", "w") as fh:
        fh.write(json.dumps({"step": 9, "best_psnr": 28.5, "best_step": 10}) + "\n")
        fh.write(json.dumps({"step": 19, "loss": 0.1}) + "\n")
        fh.write(json.dumps({"step": 19, "best_psnr": 30.1, "best_step": 20}) + "\n")
    cfg = Config().apply_overrides([
        "train.keep_best=true", f"logging.out_dir={out}",
    ])
    log = get_logger()
    assert _restore_best_psnr(cfg, 20, log) == 30.1
    # fresh run (start_step 0) and keep_best off both start from -inf
    assert _restore_best_psnr(cfg, 0, log) == -np.inf
    cfg_off = cfg.apply_overrides(["train.keep_best=false"])
    assert _restore_best_psnr(cfg_off, 20, log) == -np.inf
    # missing file: no crash
    cfg_missing = cfg.apply_overrides([f"logging.out_dir={tmp_path/'nope'}"])
    assert _restore_best_psnr(cfg_missing, 20, log) == -np.inf


def test_default_opt_state_layout_is_stable():
    """A schedule-free TrainConfig must produce EXACTLY optax.adam's
    state layout: anything extra (e.g. a schedule count leaf) silently
    invalidates every previously written checkpoint via the restore
    template's leaf-count check."""
    params = {"w": jnp.ones((4,), jnp.float32)}
    got = create_optimizer(TrainConfig()).init(params)
    # TrainConfig default wraps apply_if_finite around plain adam
    ref = optax.apply_if_finite(
        optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8),
        max_consecutive_errors=1000,
    ).init(params)
    t_got = jax.tree.structure(got)
    t_ref = jax.tree.structure(ref)
    assert t_got == t_ref, (t_got, t_ref)


def test_table_lr_mult_scales_only_table_updates():
    """table_lr_mult=c multiplies the Adam update of the hashgrid /
    triplane subtrees by exactly c and leaves MLP leaves untouched."""
    params = {
        "triplane": {"planes": jnp.ones((4,)), "lines": jnp.ones((3,))},
        "hashgrid": {"tables": jnp.ones((5,))},
        "trunk": {"w": jnp.ones((2,))},
    }
    grads = jax.tree.map(lambda p: 0.3 * jnp.ones_like(p), params)
    cfg1 = TrainConfig(skip_nonfinite=False)
    cfgc = TrainConfig(skip_nonfinite=False, table_lr_mult=10.0)
    o1, oc = create_optimizer(cfg1), create_optimizer(cfgc)
    u1, _ = o1.update(grads, o1.init(params), params)
    uc, _ = oc.update(grads, oc.init(params), params)
    np.testing.assert_allclose(
        np.asarray(uc["triplane"]["planes"]),
        10.0 * np.asarray(u1["triplane"]["planes"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(uc["hashgrid"]["tables"]),
        10.0 * np.asarray(u1["hashgrid"]["tables"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(uc["trunk"]["w"]), np.asarray(u1["trunk"]["w"]), rtol=0,
    )


def test_table_lr_mult_default_keeps_state_layout():
    """table_lr_mult=1.0 must NOT add optimizer-state leaves (checkpoint
    compatibility — same contract as the schedule-free lr float)."""
    params = {"hashgrid": {"tables": jnp.ones((4,))}, "trunk": {"w": jnp.ones((2,))}}
    got = create_optimizer(TrainConfig()).init(params)
    ref = create_optimizer(TrainConfig(table_lr_mult=1.0)).init(params)
    assert jax.tree.structure(got) == jax.tree.structure(ref)
    # and it matches plain adam-under-apply_if_finite exactly
    plain = optax.apply_if_finite(
        optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8),
        max_consecutive_errors=1000,
    ).init(params)
    assert jax.tree.structure(got) == jax.tree.structure(plain)


def test_remat_is_semantically_invisible():
    """train.remat (jax.checkpoint around the renderer) trades FLOPs for
    activation memory; the training math must be identical."""
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.renderer import make_uniform_renderer
    from tnerf.train import RayBatch, init_train_state, make_train_step

    cfg = Config().apply_overrides([
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2", "sampler.samples_per_ray=8",
        "sampler.near=2.0", "sampler.far=5.5",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    renderer = make_uniform_renderer(field, cfg.sampler, cfg.render)
    opt = create_optimizer(cfg.train)
    rng = np.random.default_rng(0)
    o = np.array([[0.1, 0.0, -3.0]] * 8, np.float32)
    d = np.array([[0.0, 0.0, 1.0]] * 8, np.float32)
    rays = Rays(origins=jnp.asarray(o), directions=jnp.asarray(d),
                viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d)))
    batch = RayBatch(rays=rays,
                     gt_rgb=jnp.asarray(rng.uniform(0, 1, (8, 3)), jnp.float32))
    outs = []
    for remat in (False, True):
        step = make_train_step(renderer, opt, remat=remat)
        st = init_train_state(field, opt, 0)
        st2, aux = step(st, batch, jax.random.PRNGKey(1))
        outs.append((st2.params, float(aux["loss"])))
    (p_a, l_a), (p_b, l_b) = outs
    assert l_a == l_b
    _allclose_tree(p_a, p_b, atol=1e-7)


def test_interrupt_saves_checkpoint(tmp_path, monkeypatch):
    """Ctrl-C mid-training persists the in-flight state before the
    exception propagates, so train.resume continues from the interrupted
    step (the reference's training state dies with the process)."""
    import pytest

    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train import PixelSampler
    from tnerf.train_loop import run_training
    from tnerf.utils.checkpoint import latest_checkpoint

    calls = {"n": 0}
    orig = PixelSampler.sample

    def interrupting(self, key, batch_size):
        calls["n"] += 1
        if calls["n"] > 7:
            raise KeyboardInterrupt
        return orig(self, key, batch_size)

    monkeypatch.setattr(PixelSampler, "sample", interrupting)
    scene = generate_procedural_scene(
        width=24, height=24, n_train=3, n_val=0, n_test=1, n_samples=64
    )
    out = tmp_path / "run"
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=16", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=128", "train.steps=50", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=10",
        f"logging.out_dir={out}", "render.chunk_size=576",
    ])
    with pytest.raises(KeyboardInterrupt):
        run_training(cfg, datasets=scene)
    found = latest_checkpoint(str(out / "checkpoints"))
    assert found is not None
    assert 0 < found[0] < 50
    # and the interrupted run resumes cleanly from that step
    monkeypatch.setattr(PixelSampler, "sample", orig)
    m = run_training(
        cfg.apply_overrides(["train.resume=true"]), datasets=scene
    )
    assert np.isfinite(m["psnr_test"])
