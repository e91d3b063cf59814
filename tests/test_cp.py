"""CP-decomposition encoding (TensoRF's rank-F ablation family): numpy
mirror parity, onehot-vs-gather parity (values and gradients), field
integration, and run_training end-to-end (same strategy as the
triplane/hashgrid suites)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.config import Config, FieldConfig
from tnerf.data.procedural import generate_procedural_scene
from tnerf.fields.triplane import (
    apply_cp,
    apply_cp_gather,
    apply_cp_onehot,
    cp_num_params,
    init_cp,
    resolve_cp_mode,
)


def small_cfg(**kw):
    base = dict(encoding="cp", tri_resolution=16, tri_features=8)
    base.update(kw)
    return FieldConfig(**base)


def numpy_cp(params, x01, cfg):
    """Independent numpy mirror: feat_f = prod_a lerp(lines[a, :, f])."""
    R = cfg.tri_resolution
    lines = np.asarray(params["lines"])  # [3, R, F]
    pos = np.clip(x01 * (R - 1), 0, (R - 1) - 1e-4)
    i0 = np.floor(pos).astype(np.int64)
    frac = (pos - i0).astype(np.float32)
    out = np.ones((x01.shape[0], cfg.tri_features), np.float32)
    for a in range(3):
        la = (1 - frac[:, a])[:, None] * lines[a, i0[:, a]] + frac[:, a][
            :, None
        ] * lines[a, i0[:, a] + 1]
        out = out * la
    return out


def test_cp_gather_matches_numpy_mirror():
    cfg = small_cfg()
    params = init_cp(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    got = np.asarray(apply_cp_gather(params, x, cfg))
    want = numpy_cp(params, np.asarray(x), cfg)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cp_vertex_exactness_and_continuity():
    cfg = small_cfg()
    params = init_cp(jax.random.PRNGKey(0), cfg)
    R = cfg.tri_resolution
    lines = np.asarray(params["lines"])
    u, v, w = 3, 5, 7
    x = jnp.array([[u, v, w]], jnp.float32) / (R - 1)
    got = np.asarray(apply_cp_gather(params, x, cfg))[0]
    np.testing.assert_allclose(
        got, lines[0, u] * lines[1, v] * lines[2, w], rtol=1e-5, atol=1e-6
    )
    eps = 1e-5
    b = 3.0 / (R - 1)
    lo = jnp.array([[b - eps, 0.37, 0.61]])
    hi = jnp.array([[b + eps, 0.37, 0.61]])
    np.testing.assert_allclose(
        np.asarray(apply_cp_gather(params, lo, cfg)),
        np.asarray(apply_cp_gather(params, hi, cfg)),
        atol=1e-3,
    )


def test_cp_onehot_matches_gather_values_and_grads():
    cfg = small_cfg(compute_dtype="float32")
    params = init_cp(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (80, 3))
    a = np.asarray(apply_cp_gather(params, x, cfg))
    b = np.asarray(apply_cp_onehot(params, x, cfg, chunk=32))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    cot = jax.random.normal(jax.random.PRNGKey(2), (80, cfg.tri_features))
    ga = jax.grad(
        lambda p: jnp.sum(apply_cp_gather(p, x, cfg) * cot)
    )(params)
    gb = jax.grad(
        lambda p: jnp.sum(apply_cp_onehot(p, x, cfg, chunk=32) * cot)
    )(params)
    np.testing.assert_allclose(
        np.asarray(ga["lines"]), np.asarray(gb["lines"]), rtol=1e-5, atol=1e-6
    )
    # positions: zero cotangent by the one-hot contract
    gx = jax.grad(lambda xx: jnp.sum(apply_cp_onehot(params, xx, cfg)))(x)
    assert float(jnp.abs(gx).sum()) == 0.0


def test_cp_mode_resolution_and_params():
    assert resolve_cp_mode(small_cfg(tri_gather_mode="onehot")) == "onehot"
    assert resolve_cp_mode(small_cfg()) == "gather"  # CPU backend
    cfg = small_cfg()
    n = sum(np.asarray(v).size for v in jax.tree.leaves(
        init_cp(jax.random.PRNGKey(0), cfg)
    ))
    assert n == cp_num_params(cfg)


def test_cp_field_and_run_training(tmp_path):
    """End-to-end: the cp family trains through run_training (twobranch
    arch, table LR mult + L1 apply to the cp subtree) and the loss
    decreases."""
    import json

    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "field_.encoding=cp", "field_.tri_resolution=32",
        "field_.tri_features=16", "field_.tri_hidden_width=32",
        "field_.tri_hidden_layers=2",
        "train.table_lr_mult=10", "train.table_l1_weight=1e-5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "train.batch_size=256", "train.steps=40", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=10",
        f"logging.out_dir={tmp_path}", "render.chunk_size=1024",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])
    lines = [json.loads(l) for l in open(f"{tmp_path}/metrics.jsonl")]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
