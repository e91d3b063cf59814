"""Fused kernel v2 (pallas_fused2): forward parity, custom-VJP gradient
parity against jax.grad of the jnp mirror, pipeline parity against the
production XLA renderer, and training THROUGH the fused kernel — the
tcnn-fused-backward capability (reference main.cu:781).  All in Pallas
interpret mode on CPU (SURVEY §4 kernel-parity strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.config import Config
from tnerf.render.pallas_fused2 import (
    fused_reference_v2,
    make_fused_pipeline_renderer_v2,
    make_fused_trainable,
)


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(0)
    NL, B, NK = 4, 64, 2
    S = NK * 128
    W = jnp.asarray(rng.normal(0, 0.3, (NL, 128, 128)).astype(np.float32))
    Bias = jnp.asarray(rng.normal(0, 0.1, (NL, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(0, 1.0, (B, 128)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.02, (B, 128)).astype(np.float32))
    te = jnp.asarray(rng.uniform(1.5, 2.5, (B, 1)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.01, 0.02, (B, 1)).astype(np.float32))
    rays8 = jnp.concatenate([te, dt, jnp.zeros((B, 6))], axis=1)
    mask = (rng.uniform(0, 1, (B, S)) < 0.7).astype(np.float32)
    mask[:4] = 0.0  # fully-masked rays must contribute nothing
    words = jnp.zeros((8, 128), jnp.int32)  # unused: coarse=None
    return NL, NK, W, Bias, gamma, beta, rays8, jnp.asarray(mask), words


def test_forward_matches_reference(workload):
    NL, NK, W, Bias, gamma, beta, rays8, mask, words = workload
    fused = make_fused_trainable(NL, NK, b_tile=32, b_tile_bwd=16,
                                 term_eps=0.0, interpret=True)
    out_k = np.asarray(fused(W, Bias, gamma, beta, rays8, mask, words))
    out_r = np.asarray(fused_reference_v2(W, Bias, gamma, beta, rays8, mask))
    np.testing.assert_allclose(out_k[:, :6], out_r[:, :6], atol=5e-3)
    # fully-masked rays: no color, full transmittance
    np.testing.assert_allclose(out_k[:4, 3], 0.0, atol=1e-6)   # acc
    np.testing.assert_allclose(out_k[:4, 5], 1.0, atol=1e-6)   # T_final


def test_custom_vjp_matches_autodiff_of_reference(workload):
    """The backward kernel IS the derivative: dL/dW and dL/db from the
    custom VJP must match jax.grad of the jnp mirror (which shares the
    bf16 matmul precision choices) to mixed-precision tolerance."""
    NL, NK, W, Bias, gamma, beta, rays8, mask, words = workload
    fused = make_fused_trainable(NL, NK, b_tile=32, b_tile_bwd=16,
                                 term_eps=0.0, interpret=True)
    rng = np.random.default_rng(1)
    cot = jnp.asarray(rng.normal(0, 1.0, (gamma.shape[0], 6)).astype(np.float32))

    def loss_k(W, Bias):
        return jnp.sum(fused(W, Bias, gamma, beta, rays8, mask, words)[:, :6] * cot)

    def loss_r(W, Bias):
        return jnp.sum(fused_reference_v2(W, Bias, gamma, beta, rays8, mask)[:, :6] * cot)

    gk = jax.grad(loss_k, argnums=(0, 1))(W, Bias)
    gr = jax.grad(loss_r, argnums=(0, 1))(W, Bias)
    for name, a, b in [("dW", gk[0], gr[0]), ("dB", gk[1], gr[1])]:
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-9)
        rel = float(np.abs(a - b).max()) / scale
        assert rel < 3e-2, (name, rel)


def _small_cfg():
    return Config().apply_overrides([
        "sampler.samples_per_ray=128", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "grid.resolution=8", "scene.scene_scale=1.0",
    ])


def _rays(B, seed=3):
    from tnerf.cameras import Rays, viewdirs_to_thetaphi

    rng = np.random.default_rng(seed)
    o = rng.uniform(-1, 1, (B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    return Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))


def test_pipeline_matches_xla_march_renderer():
    """Full renderer protocol: v2 fused pipeline vs the production XLA
    march renderer on the SAME field params (exercises pack_params_f32,
    encode_gamma_beta, occupancy masking)."""
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = _small_cfg()
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rend2 = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True)
    rendx = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                               strategy="march", compact=False)
    rays = _rays(64)
    occ = jnp.ones((8, 8, 8), bool)
    r2 = rend2(params, rays, None, occ)
    rx = rendx(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(r2.rgb), np.asarray(rx.rgb), atol=2e-2)
    np.testing.assert_allclose(np.asarray(r2.acc), np.asarray(rx.acc), atol=2e-2)


def test_training_through_fused_kernel_reduces_loss():
    """The capability the reference gets from tcnn's fused backward
    (main.cu:781): optimize field params THROUGH the fused kernel."""
    import optax

    from tnerf.fields.nerf_field import NeRFField

    cfg = _small_cfg()
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rend2 = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True)
    rays = _rays(64)
    occ = jnp.ones((8, 8, 8), bool)
    rng = np.random.default_rng(5)
    gt = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    def loss_fn(p):
        return jnp.mean((rend2(p, rays, None, occ).rgb - gt) ** 2)

    @jax.jit  # one trace for all steps (an eager loop re-traces 8x)
    def step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    losses = []
    for _ in range(8):
        params, ost, l = step(params, ost)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, losses
    assert all(np.isfinite(losses)), losses


def test_grad_zero_for_fully_masked_batch(workload):
    NL, NK, W, Bias, gamma, beta, rays8, _, words = workload
    fused = make_fused_trainable(NL, NK, b_tile=32, b_tile_bwd=16,
                                 term_eps=0.0, interpret=True)
    mask0 = jnp.zeros((gamma.shape[0], NK * 128), jnp.float32)

    def loss(W, Bias):
        return jnp.sum(fused(W, Bias, gamma, beta, rays8, mask0, words)[:, :5])

    gW, gB = jax.grad(loss, argnums=(0, 1))(W, Bias)
    assert float(jnp.abs(gW).max()) == 0.0
    assert float(jnp.abs(gB).max()) == 0.0


@pytest.mark.parametrize("res_c", [16, 32])
def test_coarse_kernel_mask_matches_xla_coarse_occupancy(res_c):
    """occupancy_mode=coarse_kernel computes the occupancy test INSIDE
    the kernel from the [8,128]-word bitfield (one row at res_c=16, all
    8 row-selected rows at res_c=32).  With the XLA renderer given the
    SAME coarsened occupancy (max-pooled then re-expanded to fine), the
    outputs must agree."""
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = _small_cfg().apply_overrides([
        "grid.resolution=32", f"render.fused_coarse_res={res_c}",
        # align the march reference's mask pooling with the kernel's
        # res_c and compare pure full-span quadrature (no tighten)
        f"sampler.occupancy_mask_res={res_c}", "sampler.tighten=false",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rend2 = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True,
        occupancy_mode="coarse_kernel")
    rendx = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                               strategy="march", compact=False)
    rng = np.random.default_rng(7)
    occ = rng.uniform(0, 1, (32, 32, 32)) < 0.15
    rays = _rays(64, seed=9)
    r2 = rend2(params, rays, None, jnp.asarray(occ))
    rx = rendx(params, rays, None, jnp.asarray(occ))
    np.testing.assert_allclose(np.asarray(r2.rgb), np.asarray(rx.rgb), atol=2e-2)
    np.testing.assert_allclose(np.asarray(r2.acc), np.asarray(rx.acc), atol=2e-2)


def test_zero_mask_forward_gives_empty(workload):
    """Fully-masked batch (forward): black, acc=0, T=1 (ported from the
    removed v1 kernel's test suite)."""
    NL, NK, W, Bias, gamma, beta, rays8, _, words = workload
    fused = make_fused_trainable(NL, NK, b_tile=32, term_eps=0.0, interpret=True)
    mask0 = jnp.zeros((gamma.shape[0], NK * 128), jnp.float32)
    out = np.asarray(fused(W, Bias, gamma, beta, rays8, mask0, words))
    np.testing.assert_allclose(out[:, 0:5], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[:, 5], 1.0, atol=1e-7)


def test_early_termination_consistent(workload):
    """term_eps chunk skipping must not change outputs beyond the
    transmittance threshold it formalizes (ported from the removed v1
    kernel's test suite): compare term_eps=0 vs term_eps=1e-3 on rays
    driven opaque early via a sigma-boosting bias."""
    NL, NK, W, Bias, gamma, beta, rays8, mask, words = workload
    hot = Bias.at[NL - 1, 3].set(8.0)  # large sigma head bias -> opaque fast
    f0 = make_fused_trainable(NL, NK, b_tile=32, term_eps=0.0, interpret=True)
    f1 = make_fused_trainable(NL, NK, b_tile=32, term_eps=1e-3, interpret=True)
    out0 = np.asarray(f0(W, hot, gamma, beta, rays8, mask, words))
    out1 = np.asarray(f1(W, hot, gamma, beta, rays8, mask, words))
    np.testing.assert_allclose(out0[:, :6], out1[:, :6], atol=2e-3)


# ---- multi-ray chunks (rpc > 1): packed-ray fast path (fwd + bwd) ----------


@pytest.mark.parametrize("rpc", [2, 4])
def test_rpc_forward_matches_reference(rpc):
    """rpc rays per 128-lane chunk (spr = 128/rpc samples each) must
    reproduce the jnp mirror run at S = n_chunks*spr samples per ray."""
    rng = np.random.default_rng(2)
    NL, NK = 3, 2
    B = 64
    spr = 128 // rpc
    S = NK * spr
    W = jnp.asarray(rng.normal(0, 0.3, (NL, 128, 128)).astype(np.float32))
    Bias = jnp.asarray(rng.normal(0, 0.1, (NL, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(0, 1.0, (B, 128)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.02, (B, 128)).astype(np.float32))
    te = jnp.asarray(rng.uniform(1.5, 2.5, (B, 1)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.01, 0.02, (B, 1)).astype(np.float32))
    rays8 = jnp.concatenate([te, dt, jnp.zeros((B, 6))], axis=1)
    mask = (rng.uniform(0, 1, (B, S)) < 0.7).astype(np.float32)
    mask[:2] = 0.0
    mask = jnp.asarray(mask)
    words = jnp.zeros((8, 128), jnp.int32)

    b_rows = B // rpc
    rays_pack = jnp.pad(
        rays8.reshape(b_rows, rpc * 8), ((0, 0), (0, 128 - rpc * 8))
    )
    mlane = (
        mask.reshape(b_rows, rpc, NK, spr).transpose(0, 2, 1, 3)
        .reshape(b_rows, NK * 128)
    )
    fused = make_fused_trainable(NL, NK, b_tile=8, term_eps=0.0,
                                 interpret=True, rpc=rpc)
    out = fused(W, Bias, gamma, beta, rays_pack, mlane, words)
    per_ray = np.asarray(
        out[:, : 6 * rpc].reshape(b_rows, 6, rpc).transpose(0, 2, 1).reshape(B, 6)
    )
    ref = np.asarray(fused_reference_v2(W, Bias, gamma, beta, rays8, mask))
    np.testing.assert_allclose(per_ray, ref[:, :6], atol=5e-3)
    # fully-masked rays: no color, full transmittance
    np.testing.assert_allclose(per_ray[:2, 3], 0.0, atol=1e-6)
    np.testing.assert_allclose(per_ray[:2, 5], 1.0, atol=1e-6)


@pytest.mark.parametrize("rpc", [2, 4])
def test_rpc_backward_matches_autodiff_of_reference(rpc):
    """Packed-ray custom VJP: dL/dW, dL/db at rpc>1 must match jax.grad
    of the jnp mirror on the corresponding unpacked rays (incl. the
    per-ray T-checkpoint lanes and the packed dL/dT_final carry)."""
    rng = np.random.default_rng(3)
    NL, NK = 3, 2
    B = 32
    spr = 128 // rpc
    S = NK * spr
    W = jnp.asarray(rng.normal(0, 0.3, (NL, 128, 128)).astype(np.float32))
    Bias = jnp.asarray(rng.normal(0, 0.1, (NL, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(0, 1.0, (B, 128)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.02, (B, 128)).astype(np.float32))
    te = jnp.asarray(rng.uniform(1.5, 2.5, (B, 1)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.01, 0.02, (B, 1)).astype(np.float32))
    rays8 = jnp.concatenate([te, dt, jnp.zeros((B, 6))], axis=1)
    mask = (rng.uniform(0, 1, (B, S)) < 0.7).astype(np.float32)
    mask[:2] = 0.0  # fully-masked rays must contribute zero gradient
    mask = jnp.asarray(mask)
    words = jnp.zeros((8, 128), jnp.int32)
    cot = jnp.asarray(rng.normal(0, 1.0, (B, 6)).astype(np.float32))

    b_rows = B // rpc
    rays_pack = jnp.pad(
        rays8.reshape(b_rows, rpc * 8), ((0, 0), (0, 128 - rpc * 8))
    )
    mlane = (
        mask.reshape(b_rows, rpc, NK, spr).transpose(0, 2, 1, 3)
        .reshape(b_rows, NK * 128)
    )
    fused = make_fused_trainable(NL, NK, b_tile=8, b_tile_bwd=8,
                                 term_eps=0.0, interpret=True, rpc=rpc)

    def loss_k(W, Bias):
        out = fused(W, Bias, gamma, beta, rays_pack, mlane, words)
        per_ray = (
            out[:, : 6 * rpc].reshape(b_rows, 6, rpc).transpose(0, 2, 1)
            .reshape(B, 6)
        )
        return jnp.sum(per_ray * cot)

    def loss_r(W, Bias):
        return jnp.sum(fused_reference_v2(W, Bias, gamma, beta, rays8, mask)[:, :6] * cot)

    gk = jax.grad(loss_k, argnums=(0, 1))(W, Bias)
    gr = jax.grad(loss_r, argnums=(0, 1))(W, Bias)
    for name, a, b in [("dW", gk[0], gr[0]), ("dB", gk[1], gr[1])]:
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-9)
        rel = float(np.abs(a - b).max()) / scale
        assert rel < 3e-2, (name, rel)


def test_exact_samples_per_ray_rpc_invariant():
    """sampler.samples_per_ray means what it says on the fused path:
    rpc=1 S=64 must be quadrature-identical to rpc=2 S=64 (the round-2
    fast-render config lost ~2 dB to S silently rounding up to the chunk
    width at rpc=1 — train and fast-render now share one quadrature)."""
    from tnerf.fields.nerf_field import NeRFField

    cfg = _small_cfg().apply_overrides(["sampler.samples_per_ray=64"])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rays = _rays(64, seed=11)
    occ = jnp.ones((8, 8, 8), bool)
    r1 = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True, rpc=1
    )(params, rays, None, occ)
    r2 = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True, rpc=2
    )(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(r1.rgb), np.asarray(r2.rgb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1.acc), np.asarray(r2.acc), atol=2e-5)


@pytest.mark.parametrize("rpc", [1, 2])
def test_fused_ray_compaction_matches_uncompacted(rpc):
    """Fused renderer with ray_compact: kept rays shade identically,
    background rays reconstruct exactly."""
    from tnerf.fields.nerf_field import NeRFField

    cfg = _small_cfg().apply_overrides([
        "grid.resolution=32", "sampler.samples_per_ray=64",
        "sampler.near=2.0",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(41)
    occ = np.zeros((32, 32, 32), bool)
    occ[12:20, 12:20, 12:20] = True
    occ = jnp.asarray(occ)
    o = rng.uniform(-1, 1, (96, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = d + rng.normal(0, 0.25, d.shape)  # some rays miss the blob
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    d = jnp.asarray(d, jnp.float32)
    rays = Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))

    mk = lambda rc: make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True,
        rpc=rpc, tighten=True, ray_compact=rc, b_tile=8, b_tile_bwd=8,
    )
    base = mk(False)(params, rays, None, occ)
    out = mk(True)(params, rays, None, occ)
    # background rays (acc==0) must match bitwise; kept rays to float tol
    # (the compacted batch tiles differently -> bf16 rounding order)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(base.rgb),
                               atol=3e-3)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(base.acc),
                               atol=3e-3)
    assert float(np.abs(np.asarray(out.acc) - np.asarray(base.acc)).max()) < 3e-3


# ---- tmode (per-sample t placement, the CDF-capable path) ------------------


@pytest.fixture(scope="module")
def t_workload():
    from tnerf.render.pallas_fused2 import fused_reference_v2_t  # noqa: F401

    rng = np.random.default_rng(7)
    NL, B, NK = 4, 64, 2
    S = NK * 128
    W = jnp.asarray(rng.normal(0, 0.3, (NL, 128, 128)).astype(np.float32))
    Bias = jnp.asarray(rng.normal(0, 0.1, (NL, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(0, 1.0, (B, 128)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.5, (B, 128)).astype(np.float32))
    te = rng.uniform(1.5, 2.5, (B, 1)).astype(np.float32)
    span = rng.uniform(1.0, 3.0, (B, 1)).astype(np.float32)
    u = np.sort(rng.uniform(0, 1, (B, S)).astype(np.float32), axis=1)
    ts = jnp.asarray(te + u * span)  # monotone, non-uniform (CDF-like)
    dts = jnp.asarray(rng.uniform(0.004, 0.02, (B, S)).astype(np.float32))
    rays8 = jnp.zeros((B, 8), jnp.float32)  # te/dt slots unused in tmode
    mask = (rng.uniform(0, 1, (B, S)) < 0.7).astype(np.float32)
    mask[:4] = 0.0
    words = jnp.zeros((8, 128), jnp.int32)
    return NL, NK, W, Bias, gamma, beta, rays8, ts, dts, jnp.asarray(mask), words


def test_tmode_forward_matches_reference(t_workload):
    from tnerf.render.pallas_fused2 import fused_reference_v2_t

    NL, NK, W, Bias, gamma, beta, rays8, ts, dts, mask, words = t_workload
    fused = make_fused_trainable(NL, NK, b_tile=32, b_tile_bwd=16,
                                 term_eps=0.0, interpret=True, tmode=True)
    out_k = np.asarray(fused(W, Bias, gamma, beta, rays8, mask, ts, dts, words))
    out_r = np.asarray(fused_reference_v2_t(W, Bias, gamma, beta, mask, ts, dts))
    np.testing.assert_allclose(out_k[:, :6], out_r[:, :6], atol=5e-3)
    np.testing.assert_allclose(out_k[:4, 3], 0.0, atol=1e-6)
    np.testing.assert_allclose(out_k[:4, 5], 1.0, atol=1e-6)


def test_tmode_reduces_to_uniform_on_affine_ts(t_workload):
    """With ts = te + (s+0.5)*dt (and the gamma/beta refold gamma_u =
    gamma0 + te*beta0, beta_u = dt*beta0), tmode must reproduce the
    uniform kernel: same math, different parameterization."""
    NL, NK, W, Bias, gamma0, beta0, _, _, _, mask, words = t_workload
    B = gamma0.shape[0]
    S = NK * 128
    rng = np.random.default_rng(11)
    te = jnp.asarray(rng.uniform(1.5, 2.5, (B, 1)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.004, 0.01, (B, 1)).astype(np.float32))
    s = jnp.arange(S, dtype=jnp.float32)[None, :] + 0.5
    ts = te + s * dt
    dts = jnp.broadcast_to(dt, (B, S))
    gamma_u = gamma0 + te * beta0
    beta_u = dt * beta0
    rays8_u = jnp.concatenate([te, dt, jnp.zeros((B, 6))], axis=1)
    f_u = make_fused_trainable(NL, NK, term_eps=0.0, interpret=True)
    f_t = make_fused_trainable(NL, NK, term_eps=0.0, interpret=True, tmode=True)
    out_u = np.asarray(f_u(W, Bias, gamma_u, beta_u, rays8_u, mask, words))
    out_t = np.asarray(f_t(W, Bias, gamma0, beta0, jnp.zeros((B, 8)),
                           mask, ts, dts, words))
    np.testing.assert_allclose(out_t[:, :6], out_u[:, :6], atol=2e-3)


@pytest.mark.parametrize("rpc", [2, 4])
def test_tmode_rpc_forward_matches_reference(rpc):
    from tnerf.render.pallas_fused2 import fused_reference_v2_t

    rng = np.random.default_rng(13)
    NL, B, NK = 3, 64, 2
    spr = 128 // rpc
    S = NK * spr
    W = jnp.asarray(rng.normal(0, 0.3, (NL, 128, 128)).astype(np.float32))
    Bias = jnp.asarray(rng.normal(0, 0.1, (NL, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(0, 1.0, (B, 128)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.5, (B, 128)).astype(np.float32))
    te = rng.uniform(1.5, 2.5, (B, 1)).astype(np.float32)
    span = rng.uniform(1.0, 3.0, (B, 1)).astype(np.float32)
    u = np.sort(rng.uniform(0, 1, (B, S)).astype(np.float32), axis=1)
    ts = jnp.asarray(te + u * span)
    dts = jnp.asarray(rng.uniform(0.004, 0.02, (B, S)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(0, 1, (B, S)) < 0.7).astype(np.float32))
    words = jnp.zeros((8, 128), jnp.int32)

    b_rows = B // rpc
    pk = lambda X: (
        X.reshape(b_rows, rpc, NK, spr).transpose(0, 2, 1, 3)
        .reshape(b_rows, NK * 128)
    )
    rays_pack = jnp.zeros((b_rows, 128), jnp.float32)
    fused = make_fused_trainable(NL, NK, b_tile=8, b_tile_bwd=8,
                                 term_eps=0.0, interpret=True, rpc=rpc,
                                 tmode=True)
    out = fused(W, Bias, gamma, beta, rays_pack, pk(mask), pk(ts), pk(dts),
                words)
    got = np.asarray(
        out[:, : 6 * rpc].reshape(b_rows, 6, rpc).transpose(0, 2, 1).reshape(B, 6)
    )
    ref = np.asarray(fused_reference_v2_t(W, Bias, gamma, beta, mask, ts, dts))
    np.testing.assert_allclose(got, ref[:, :6], atol=5e-3)


@pytest.mark.parametrize("rpc", [1, 2])
def test_tmode_backward_matches_autodiff_of_reference(rpc):
    from tnerf.render.pallas_fused2 import fused_reference_v2_t

    rng = np.random.default_rng(17)
    NL, B, NK = 3, 32, 2
    spr = 128 // rpc
    S = NK * spr
    W = jnp.asarray(rng.normal(0, 0.3, (NL, 128, 128)).astype(np.float32))
    Bias = jnp.asarray(rng.normal(0, 0.1, (NL, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(0, 1.0, (B, 128)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.5, (B, 128)).astype(np.float32))
    te = rng.uniform(1.5, 2.5, (B, 1)).astype(np.float32)
    span = rng.uniform(1.0, 3.0, (B, 1)).astype(np.float32)
    u = np.sort(rng.uniform(0, 1, (B, S)).astype(np.float32), axis=1)
    ts = jnp.asarray(te + u * span)
    dts = jnp.asarray(rng.uniform(0.004, 0.02, (B, S)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(0, 1, (B, S)) < 0.7).astype(np.float32))
    words = jnp.zeros((8, 128), jnp.int32)
    cot = jnp.asarray(rng.normal(0, 1, (B, 6)).astype(np.float32))

    b_rows = B // rpc
    if rpc == 1:
        rays_pack, m_p, ts_p, dts_p = jnp.zeros((B, 8)), mask, ts, dts
    else:
        pk = lambda X: (
            X.reshape(b_rows, rpc, NK, spr).transpose(0, 2, 1, 3)
            .reshape(b_rows, NK * 128)
        )
        rays_pack = jnp.zeros((b_rows, 128), jnp.float32)
        m_p, ts_p, dts_p = pk(mask), pk(ts), pk(dts)
    fused = make_fused_trainable(NL, NK, b_tile=8, b_tile_bwd=8,
                                 term_eps=0.0, interpret=True, rpc=rpc,
                                 tmode=True)

    def loss_k(W, Bias):
        out = fused(W, Bias, gamma, beta, rays_pack, m_p, ts_p, dts_p, words)
        if rpc == 1:
            per = out[:, :6]
        else:
            per = (
                out[:, : 6 * rpc].reshape(b_rows, 6, rpc).transpose(0, 2, 1)
                .reshape(B, 6)
            )
        return jnp.sum(per * cot)

    def loss_r(W, Bias):
        return jnp.sum(
            fused_reference_v2_t(W, Bias, gamma, beta, mask, ts, dts)[:, :6]
            * cot
        )

    gk = jax.grad(loss_k, argnums=(0, 1))(W, Bias)
    gr = jax.grad(loss_r, argnums=(0, 1))(W, Bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=1e-2)


# ---- fused CDF placement (sampler.placement="occupancy_cdf") ---------------


def _cdf_cfg(S=32, rpc=1):
    return Config().apply_overrides([
        f"sampler.samples_per_ray={S}", "sampler.near=2.0", "sampler.far=5.5",
        "sampler.placement=occupancy_cdf", "sampler.cdf_bins=32",
        "sampler.tighten=true", "sampler.tighten_res=16",
        "sampler.occupancy_mask_res=16",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "grid.resolution=16", "scene.scene_scale=1.0",
        f"render.fused_rpc={rpc}", f"render.fused_train_rpc={rpc}",
        "render.fused_tighten=true",
    ])


def _half_occ(res=16):
    occ = np.zeros((res, res, res), bool)
    occ[:, :, : res // 2] = True  # occupied half-space: bins differ per ray
    return jnp.asarray(occ)


@pytest.mark.parametrize("rpc", [1, 2])
def test_fused_cdf_matches_march_cdf_renderer(rpc):
    """Fused CDF placement vs the march CDF renderer on the SAME params,
    occupancy, and placement config: both probe cdf_bins midpoints of
    the tightened span on the same (un)pooled grid, so the quadratures
    coincide and outputs must match to bf16-MLP tolerance."""
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = _cdf_cfg(S=32, rpc=rpc)
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rend2 = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True,
        rpc=rpc, tighten=True)
    rendx = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                               strategy="march", compact=False)
    rays = _rays(64)
    occ = _half_occ()
    r2 = rend2(params, rays, None, occ)
    rx = rendx(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(r2.rgb), np.asarray(rx.rgb), atol=2e-2)
    np.testing.assert_allclose(np.asarray(r2.acc), np.asarray(rx.acc), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(r2.depth * r2.acc), np.asarray(rx.depth * rx.acc), atol=5e-2
    )


def test_fused_cdf_ray_compact_matches_dense():
    """Ray compaction under CDF placement reconstructs exactly: kept rays
    match the dense render, dropped (no-occupied-bin) rays come back as
    background (acc=0)."""
    from tnerf.fields.nerf_field import NeRFField

    cfg = _cdf_cfg(S=32).apply_overrides(
        ["render.ray_compact_fraction=1.0"]  # every ray sees content here
    )
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    dense = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True,
        tighten=True)
    compacted = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True,
        tighten=True, ray_compact=True)
    rays = _rays(64)
    occ = _half_occ()
    rd = dense(params, rays, None, occ)
    rc = compacted(params, rays, None, occ)
    np.testing.assert_allclose(np.asarray(rc.rgb), np.asarray(rd.rgb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rc.acc), np.asarray(rd.acc), atol=1e-5)


def test_fused_cdf_training_reduces_loss():
    """Training THROUGH the tmode kernel (jittered CDF placement): the
    custom VJP must reach the field params and reduce the loss."""
    import optax

    from tnerf.cameras import Rays
    from tnerf.fields.nerf_field import NeRFField

    cfg = _cdf_cfg(S=32)
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rend = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True,
        tighten=True)
    rays = _rays(64)
    occ = _half_occ()
    gt = jnp.asarray(
        np.random.default_rng(0).uniform(0, 0.3, (64, 3)).astype(np.float32)
    )
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    def loss_fn(p, key):
        return jnp.mean((rend(p, rays, key, occ).rgb - gt) ** 2)

    @jax.jit  # one trace for all steps (an eager loop re-traces 12x)
    def step(p, o, k):
        l, g = jax.value_and_grad(loss_fn)(p, k)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(12):
        key, k = jax.random.split(key)
        params, ost, l = step(params, ost, k)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.7, losses


def test_fused_cdf_validations():
    cfg = _cdf_cfg()
    with pytest.raises(ValueError, match="density_cdf"):
        make_fused_pipeline_renderer_v2(
            cfg.field_, cfg.grid,
            cfg.sampler._replace(placement="density_cdf")
            if hasattr(cfg.sampler, "_replace")
            else cfg.apply_overrides(
                ["sampler.placement=density_cdf"]).sampler,
            cfg.render, interpret=True, tighten=True)
    with pytest.raises(ValueError, match="tighten"):
        make_fused_pipeline_renderer_v2(
            cfg.field_, cfg.grid, cfg.sampler, cfg.render, interpret=True,
            tighten=False)
