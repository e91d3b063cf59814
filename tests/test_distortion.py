"""mip-NeRF 360 distortion loss (train.distortion_weight).

Oracle: the O(S^2) double sum of eq. 15.  The product surface is the
per-ray `RenderResult.distortion` field computed by the compositor and
the train-step term that consumes it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.config import Config
from tnerf.render.composite import composite, distortion_term


def _oracle(w, s, d):
    inter = np.einsum("bi,bj,bij->b", w, w, np.abs(s[:, :, None] - s[:, None, :]))
    intra = (w * w * d).sum(-1) / 3.0
    return inter + intra


def test_distortion_matches_quadratic_oracle():
    rng = np.random.default_rng(0)
    B, S = 16, 32
    t = np.sort(rng.uniform(0.0, 4.0, (B, S)), axis=-1).astype(np.float32)
    w = rng.uniform(0.0, 0.2, (B, S)).astype(np.float32)
    d = rng.uniform(0.01, 0.1, (B, S)).astype(np.float32)
    got = np.asarray(distortion_term(jnp.asarray(w), jnp.asarray(t), jnp.asarray(d)))
    np.testing.assert_allclose(got, _oracle(w, t, d), rtol=2e-5, atol=1e-6)


def test_distortion_two_spike_closed_form():
    """Two unit-ish spikes at t=1 and t=3: inter = 2*w1*w2*|3-1|."""
    t = jnp.asarray([[1.0, 3.0]])
    w = jnp.asarray([[0.4, 0.5]])
    d = jnp.asarray([[0.0, 0.0]])  # zero widths isolate the inter term
    got = float(distortion_term(w, t, d)[0])
    np.testing.assert_allclose(got, 2.0 * 0.4 * 0.5 * 2.0, rtol=1e-6)


def test_distortion_prefers_concentrated_weights():
    """The same total weight mass spread over the ray costs more than
    concentrated in adjacent samples — the floater-suppression
    property."""
    S = 64
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, S), (1, S))
    d = jnp.full((1, S), 1.0 / S)
    spread = jnp.full((1, S), 1.0 / S)
    conc = jnp.zeros((1, S)).at[0, 30:34].set(0.25)
    l_spread = float(distortion_term(spread, t, d)[0])
    l_conc = float(distortion_term(conc, t, d)[0])
    assert l_conc < l_spread / 5.0, (l_conc, l_spread)
    # and the gradient is finite
    g = jax.grad(lambda w: distortion_term(w, t, d).sum())(spread)
    assert np.isfinite(np.asarray(g)).all()


def test_composite_exposes_distortion():
    rng = np.random.default_rng(1)
    B, S = 8, 16
    t = np.sort(rng.uniform(0.1, 2.0, (B, S)), axis=-1).astype(np.float32)
    d = np.diff(t, axis=-1, append=t[:, -1:] + 0.05).astype(np.float32)
    sigma = rng.uniform(0.0, 5.0, (B, S)).astype(np.float32)
    rgb = rng.uniform(0, 1, (B, S, 3)).astype(np.float32)
    res = composite(
        jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(d),
        t_mid=jnp.asarray(t),
    )
    assert res.distortion.shape == (B,)
    np.testing.assert_allclose(
        np.asarray(res.distortion),
        _oracle(np.asarray(res.weights), t, d),
        rtol=2e-5, atol=1e-6,
    )
    # masked samples drop out of the term entirely (their w = 0)
    mask = np.ones((B, S), bool)
    mask[:, ::2] = False
    res_m = composite(
        jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(d),
        t_mid=jnp.asarray(t), mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(res_m.distortion),
        _oracle(np.asarray(res_m.weights), t, d),
        rtol=2e-5, atol=1e-6,
    )


def _cfg(tmp_path, *over):
    return Config().apply_overrides([
        "scene.kind=procedural", "scene.name=prims",
        "scene.proc_width=16", "scene.proc_height=16",
        "scene.proc_n_train=2", "scene.proc_n_val=1", "scene.proc_n_test=1",
        "scene.proc_n_samples=32",
        "render.pipeline=grid_march", "render.compact=false",
        "sampler.samples_per_ray=16", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "grid.resolution=8", "grid.warmup_steps=100",
        "train.batch_size=64", "train.steps=6", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=2",
        "train.distortion_weight=0.01",
        f"logging.out_dir={tmp_path / 'run'}", "render.chunk_size=256",
        *over,
    ])


def test_distortion_trains_and_logs(tmp_path):
    import json

    from tnerf.train_loop import run_training

    m = run_training(_cfg(tmp_path))
    assert np.isfinite(m["psnr_test"])
    logged = [
        json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")
    ]
    dist = [r["distortion"] for r in logged if "distortion" in r]
    assert dist and all(np.isfinite(v) and v >= 0.0 for v in dist)


def test_distortion_validation_rejections(tmp_path):
    from tnerf.train_loop import run_training

    with pytest.raises(ValueError, match="fused"):
        run_training(_cfg(
            tmp_path, "render.pipeline=fused", "render.fused_train_rpc=1",
        ))
    with pytest.raises(ValueError, match="render.compact"):
        run_training(_cfg(tmp_path, "render.compact=true"))
    with pytest.raises(ValueError, match="sample_parallel"):
        run_training(_cfg(
            tmp_path, "render.pipeline=grid_intervals",
            "parallel.sample_parallel=2", "parallel.data_parallel=1",
        ))
