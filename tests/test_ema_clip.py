"""train.param_ema (Polyak weight EMA for eval) and train.grad_clip
(global-norm gradient clipping)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.config import Config, TrainConfig
from tnerf.train import (
    TrainState,
    create_optimizer,
    eval_params,
    init_train_state,
)


class _ToyField:
    def init(self, key):
        return {"w": jnp.asarray([1.0, -2.0, 3.0])}


def test_grad_clip_bounds_the_first_update():
    """With clip far below Adam's eps, the first-step update collapses
    toward zero (g/(|g|+eps) -> g/eps); unclipped it is ~lr."""
    params = {"w": jnp.asarray([1.0, 1.0])}
    grads = {"w": jnp.asarray([10.0, -10.0])}
    base = TrainConfig()
    for clip, expect_big in ((0.0, True), (1e-12, False)):
        opt = create_optimizer(dataclasses.replace(base, grad_clip=clip))
        st = opt.init(params)
        upd, _ = opt.update(grads, st, params)
        mag = float(jnp.abs(upd["w"]).max())
        if expect_big:
            assert mag > 0.5 * base.lr, mag
        else:
            assert mag < 1e-4 * base.lr, mag
    # the chain slot changes the state layout (documented in config.py)
    s0 = jax.tree.structure(
        create_optimizer(base).init(params)
    )
    s1 = jax.tree.structure(
        create_optimizer(dataclasses.replace(base, grad_clip=1.0)).init(params)
    )
    assert s0 != s1


def test_param_ema_init_update_and_eval_params():
    from tnerf.train import make_train_step

    field = _ToyField()
    cfg = TrainConfig()
    opt = create_optimizer(cfg)
    st = init_train_state(field, opt, 0, param_ema=True)
    np.testing.assert_array_equal(
        np.asarray(st.ema["w"]), np.asarray(st.params["w"])
    )
    assert eval_params(st) is st.ema
    st_off = init_train_state(field, opt, 0)
    assert st_off.ema is None and eval_params(st_off) is st_off.params

    # one manual step: ema1 == d*params0 + (1-d)*params1 exactly
    d = 0.9

    class _Res:
        rgb = None
        acc = jnp.zeros((4,))

    def renderer(params, rays, key, occupancy=None):
        r = _Res()
        r.rgb = jnp.broadcast_to(params["w"][:3], (4, 3))
        return r

    step = make_train_step(renderer, opt, param_ema=d)

    from tnerf.cameras import Rays
    from tnerf.train import RayBatch

    batch = RayBatch(
        rays=Rays(
            origins=jnp.zeros((4, 3)),
            directions=jnp.ones((4, 3)),
            viewdirs_tp=jnp.zeros((4, 2)),
        ),
        gt_rgb=jnp.zeros((4, 3)),
    )
    p0 = st.params
    st1, _ = step(st, batch, jax.random.PRNGKey(0))
    expect = jax.tree.map(
        lambda e, p: d * e + (1 - d) * p, p0, st1.params
    )
    np.testing.assert_allclose(
        np.asarray(st1.ema["w"]), np.asarray(expect["w"]), rtol=1e-6
    )


def test_param_ema_checkpoint_roundtrip(tmp_path):
    from tnerf.utils.checkpoint import restore_checkpoint, save_checkpoint

    field = _ToyField()
    opt = create_optimizer(TrainConfig())
    st = init_train_state(field, opt, 0, param_ema=True)
    st = st._replace(ema={"w": jnp.asarray([9.0, 9.0, 9.0])})
    save_checkpoint(str(tmp_path / "ck"), 5, st)
    template = init_train_state(field, opt, 0, param_ema=True)
    step, got = restore_checkpoint(str(tmp_path / "ck"), template)
    assert step == 5
    np.testing.assert_array_equal(np.asarray(got.ema["w"]), [9.0, 9.0, 9.0])
    # an ema-free template sees a different leaf count and rejects
    with pytest.raises(ValueError):
        restore_checkpoint(
            str(tmp_path / "ck"), init_train_state(field, opt, 0)
        )


def test_param_ema_trains_end_to_end(tmp_path):
    """run_training with param_ema on: eval reads the shadow (metrics
    finite), the checkpoint carries it, and a CLI-style restore template
    built from the same config matches."""
    from tnerf.grid.occupancy import init_occupancy
    from tnerf.train_loop import build_field, run_training
    from tnerf.utils.checkpoint import restore_checkpoint

    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.name=prims",
        "scene.proc_width=12", "scene.proc_height=12",
        "scene.proc_n_train=2", "scene.proc_n_val=1", "scene.proc_n_test=1",
        "scene.proc_n_samples=24",
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=8",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "grid.resolution=8", "grid.warmup_steps=100",
        "train.batch_size=64", "train.steps=10", "train.eval_every=5",
        "train.checkpoint_every=10", "train.log_every=5",
        "train.param_ema=0.9", "train.grad_clip=1.0",
        f"logging.out_dir={tmp_path / 'run'}", "render.chunk_size=144",
    ])
    m = run_training(cfg)
    assert np.isfinite(m["psnr_test"])
    field = build_field(cfg)
    opt = create_optimizer(cfg.train)
    template = (
        init_train_state(field, opt, cfg.train.seed, param_ema=True),
        init_occupancy(cfg.grid),
    )
    step, (state, _) = restore_checkpoint(
        str(tmp_path / "run" / "checkpoints"), template
    )
    assert step == 10 and state.ema is not None
    # after 10 steps the shadow must lag the live params
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree.leaves(state.ema), jax.tree.leaves(state.params)
        )
    )
    assert diff > 0.0
