"""Field tests: encoding correctness vs numpy mirror, MLP shapes/dtypes,
field contract (5-D input semantics per reference main.cu:322-323)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tnerf.config import Config
from tnerf.fields.encodings import frequency_encoding, frequency_encoding_dim
from tnerf.fields.mlp import apply_mlp, init_mlp, mlp_num_params
from tnerf.fields.nerf_field import NeRFField


def test_frequency_encoding_matches_numpy_mirror():
    x = np.linspace(-1, 1, 12, dtype=np.float32).reshape(4, 3)
    L = 4
    enc = np.asarray(frequency_encoding(jnp.asarray(x), L))
    assert enc.shape == (4, frequency_encoding_dim(3, L))
    # numpy mirror
    freqs = math.pi * 2.0 ** np.arange(L)
    xb = x[..., None] * freqs  # [4,3,L]
    mirror = np.concatenate([x, np.concatenate([np.sin(xb), np.cos(xb)], -1).reshape(4, -1)], -1)
    np.testing.assert_allclose(enc, mirror, atol=1e-5)


def test_mlp_shapes_and_param_count():
    key = jax.random.PRNGKey(0)
    p = init_mlp(key, 10, 32, 3, 4)
    assert len(p["w"]) == 4  # in->h, h->h, h->h, h->out
    out = apply_mlp(p, jnp.ones((7, 10)))
    assert out.shape == (7, 4)
    assert out.dtype == jnp.float32
    n = sum(int(np.prod(w.shape)) for w in p["w"]) + sum(int(b.shape[0]) for b in p["b"])
    assert n == mlp_num_params(10, 32, 3, 4)


def test_mlp_bf16_compute_close_to_fp32():
    key = jax.random.PRNGKey(1)
    p = init_mlp(key, 8, 64, 2, 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 8))
    y16 = apply_mlp(p, x, compute_dtype=jnp.bfloat16)
    y32 = apply_mlp(p, x, compute_dtype=jnp.float32)
    rel = np.abs(np.asarray(y16 - y32)) / (np.abs(np.asarray(y32)) + 1e-3)
    assert rel.mean() < 0.05


def _mkfield(**ov):
    cfg = Config().apply_overrides([
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
        *[f"field_.{k}={v}" for k, v in ov.items()],
    ])
    return NeRFField(cfg.field_, cfg.grid)


def test_field_contract_fused5d():
    field = _mkfield()
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 5, 3), minval=-1, maxval=1)
    v = jax.random.uniform(jax.random.PRNGKey(2), (6, 1, 2), minval=0, maxval=3)
    rgb, sigma = field.apply(params, x, v)
    assert rgb.shape == (6, 5, 3) and sigma.shape == (6, 5)
    r, s = np.asarray(rgb), np.asarray(sigma)
    assert (r >= 0).all() and (r <= 1).all()  # sigmoid
    assert (s >= 0).all()                      # density nonneg
    # view dirs as unit 3-vectors accepted too
    v3 = jnp.concatenate([jnp.ones((6, 1, 1)), jnp.zeros((6, 1, 2))], -1)
    rgb2, _ = field.apply(params, x, v3)
    assert rgb2.shape == (6, 5, 3)


def test_field_twobranch_density_view_independent():
    field = _mkfield()
    field = NeRFField(field.config, field.grid, arch="twobranch")
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 3), minval=-1, maxval=1)
    _, s1 = field.apply(params, x, jnp.zeros((10, 2)))
    _, s2 = field.apply(params, x, jnp.ones((10, 2)))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(field.density(params, x)), np.asarray(s1), atol=1e-6)


def test_field_gradients_finite():
    field = _mkfield()
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    v = jnp.zeros((16, 2))

    def loss(p):
        rgb, sigma = field.apply(p, x, v)
        return jnp.mean(rgb) + jnp.mean(sigma)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))
