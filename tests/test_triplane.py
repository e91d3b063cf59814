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
