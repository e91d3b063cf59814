"""Fused Pallas hash-encode parity vs the oracle gather formulation,
interpret mode on CPU (SURVEY §4 kernel-parity strategy).

The kernel must reproduce apply_hashgrid_gather's values to f32 ulp
noise (corner contributions sum in lane-major instead of corner-major
order) and its table cotangents through the accumulating backward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.config import FieldConfig
from tnerf.fields.hashgrid import (
    apply_hashgrid_gather,
    init_hashgrid,
)
from tnerf.fields.pallas_hash import _TILE, apply_hashgrid_pallas


def _cfg(**kw):
    base = dict(
        encoding="hashgrid",
        hash_levels=6,
        hash_features_per_level=2,
        hash_log2_table_size=13,
        hash_base_resolution=16,
        hash_max_resolution=256,
        compute_dtype="float32",
    )
    base.update(kw)
    return FieldConfig(**base)


def _setup(cfg, n=1000, seed=0):
    params = init_hashgrid(jax.random.PRNGKey(seed), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 3))
    return params, x


@pytest.mark.parametrize("nearest", [0, 3, 6])
def test_forward_parity(nearest):
    cfg = _cfg(hash_nearest_levels=nearest)
    params, x = _setup(cfg)
    ref = apply_hashgrid_gather(params, x, cfg)
    got = apply_hashgrid_pallas(params, x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-9)


def test_forward_parity_t14_l12():
    # The shipped preset shape: T=2^14, 12 levels, res 16..2048.
    cfg = _cfg(hash_levels=12, hash_log2_table_size=14, hash_max_resolution=2048)
    params, x = _setup(cfg, n=700)
    ref = apply_hashgrid_gather(params, x, cfg)
    got = apply_hashgrid_pallas(params, x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-9)


def test_forward_small_table_row_padding():
    # T=2^12 -> 32 real rows, padded to 128 in the kernel layout.
    cfg = _cfg(hash_log2_table_size=12)
    params, x = _setup(cfg, n=300)
    ref = apply_hashgrid_gather(params, x, cfg)
    got = apply_hashgrid_pallas(params, x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-9)


def test_forward_bf16_matches_onehot_semantics():
    # bf16 compute: table values quantize to bf16 before selection, like
    # the XLA onehot path; the gather oracle runs on bf16-rounded tables.
    cfg = _cfg(compute_dtype="bfloat16")
    params, x = _setup(cfg)
    rounded = {
        "tables": params["tables"].astype(jnp.bfloat16).astype(jnp.float32)
    }
    ref = apply_hashgrid_gather(rounded, x, cfg)
    got = apply_hashgrid_pallas(params, x, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), atol=2e-3, rtol=1e-2
    )


def test_padding_and_batch_shapes():
    cfg = _cfg()
    params, _ = _setup(cfg)
    # n not a multiple of the tile; extra batch dims collapse and restore
    x = jax.random.uniform(jax.random.PRNGKey(3), (7, 61, 3))
    ref = apply_hashgrid_gather(params, x, cfg)
    got = apply_hashgrid_pallas(params, x, cfg, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-9)
    assert (7 * 61) % _TILE != 0  # the pad path was actually exercised


@pytest.mark.parametrize("nearest", [0, 3])
def test_table_gradient_parity(nearest):
    cfg = _cfg(hash_nearest_levels=nearest)
    params, x = _setup(cfg)
    g = jax.random.normal(jax.random.PRNGKey(4), (x.shape[0], 12))

    def loss_ref(t):
        return (apply_hashgrid_gather({"tables": t}, x, cfg) * g).sum()

    def loss_pal(t):
        return (
            apply_hashgrid_pallas({"tables": t}, x, cfg, interpret=True) * g
        ).sum()

    dref = jax.grad(loss_ref)(params["tables"])
    dpal = jax.grad(loss_pal)(params["tables"])
    np.testing.assert_allclose(
        np.asarray(dref), np.asarray(dpal), atol=1e-5, rtol=1e-5
    )


def test_gradient_multi_tile_accumulation():
    # More than one kernel block: the accumulating backward must sum
    # across grid steps, not overwrite.
    cfg = _cfg(hash_levels=4, hash_max_resolution=64)
    params, _ = _setup(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (3 * _TILE + 17, 3))
    g = jnp.ones((x.shape[0], 8))

    def loss_ref(t):
        return (apply_hashgrid_gather({"tables": t}, x, cfg) * g).sum()

    def loss_pal(t):
        return (
            apply_hashgrid_pallas({"tables": t}, x, cfg, interpret=True) * g
        ).sum()

    dref = jax.grad(loss_ref)(params["tables"])
    dpal = jax.grad(loss_pal)(params["tables"])
    np.testing.assert_allclose(
        np.asarray(dref), np.asarray(dpal), atol=1e-5, rtol=1e-5
    )


def test_oversized_table_raises():
    cfg = _cfg(hash_log2_table_size=16)
    params, x = _setup(cfg, n=10)
    with pytest.raises(ValueError, match="2\\^15"):
        apply_hashgrid_pallas(params, x, cfg, interpret=True)


def test_dispatch_mode_pallas():
    from tnerf.fields.hashgrid import apply_hashgrid

    cfg = _cfg()
    params, x = _setup(cfg, n=100)
    # interpret defaults False; on CPU the kernel still runs via the
    # Pallas CPU lowering in recent JAX — guard with interpret fallback.
    ref = apply_hashgrid_gather({"hashgrid": params}["hashgrid"], x, cfg)
    got = apply_hashgrid({"tables": params["tables"]}, x, cfg, mode="pallas")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-9)
