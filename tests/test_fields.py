"""Field tests: encoding correctness vs numpy mirror, MLP shapes/dtypes,
field contract (5-D input semantics per reference main.cu:322-323)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


# ---- spherical harmonics view encoding (tcnn SphericalHarmonics role) ----

def test_sh_encoding_matches_scipy_oracle():
    """Independent oracle: scipy's complex Y_l^m mapped to the real basis
    {m=0: Re Y_l^0; m>0: sqrt(2) Re Y_l^m; m<0: sqrt(2) Im Y_l^|m|}
    (no Condon-Shortley in the real mapping — the graphics convention)."""
    scipy_special = pytest.importorskip("scipy.special")
    from tnerf.fields.encodings import sh_encoding

    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    theta = np.arccos(d[:, 2])
    phi = np.arctan2(d[:, 1], d[:, 0])
    ours = np.asarray(sh_encoding(jnp.asarray(d, jnp.float32), 4))
    i = 0
    for l in range(4):
        for m in range(-l, l + 1):
            Y = scipy_special.sph_harm_y(l, abs(m), theta, phi)
            if m == 0:
                v = Y.real
            elif m > 0:
                v = np.sqrt(2) * Y.real
            else:
                v = np.sqrt(2) * Y.imag
            np.testing.assert_allclose(ours[:, i], v, atol=5e-6, err_msg=f"l={l} m={m}")
            i += 1


def test_sh_encoding_unsold_identity_and_normalization():
    """Per-band energy sum_m Y_lm(d)^2 == (2l+1)/(4pi) for EVERY
    direction (Unsold), and non-unit inputs are normalized internally."""
    from tnerf.fields.encodings import sh_encoding, sh_encoding_dim

    rng = np.random.default_rng(1)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    for degree in (1, 2, 3, 4):
        enc = np.asarray(sh_encoding(jnp.asarray(d), degree))
        assert enc.shape == (128, sh_encoding_dim(degree))
        idx = 0
        for l in range(degree):
            n = 2 * l + 1
            s = (enc[:, idx:idx + n] ** 2).sum(-1)
            np.testing.assert_allclose(s, (2 * l + 1) / (4 * np.pi), atol=1e-5)
            idx += n
    # scaling the input does not change the encoding
    a = np.asarray(sh_encoding(jnp.asarray(d), 4))
    b = np.asarray(sh_encoding(jnp.asarray(3.7 * d), 4))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_field_sh_view_encoding_both_arches():
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 4, 3), minval=-1, maxval=1)
    vtp = jax.random.uniform(jax.random.PRNGKey(2), (6, 1, 2))  # thetaphi
    for arch in ("fused5d", "twobranch"):
        cfg = Config().apply_overrides([
            "field_.hidden_width=32", "field_.hidden_layers=2",
            "field_.n_frequencies=4", "field_.view_encoding=sh",
            "field_.sh_degree=3",
        ])
        field = NeRFField(cfg.field_, cfg.grid, arch=arch)
        params = field.init(jax.random.PRNGKey(0))
        rgb, sigma = field.apply(params, x, vtp)
        assert rgb.shape == (6, 4, 3) and sigma.shape == (6, 4)
        assert np.all(np.isfinite(np.asarray(rgb)))
        # unit-vector viewdirs accepted too, and grads stay finite
        v3 = jax.random.normal(jax.random.PRNGKey(3), (6, 1, 3))
        g = jax.grad(
            lambda p: field.apply(p, x, v3)[0].sum()
        )(params)
        assert all(
            bool(np.all(np.isfinite(np.asarray(leaf))))
            for leaf in jax.tree_util.tree_leaves(g)
        )


def test_fused_pipeline_rejects_sh_view_encoding():
    from tnerf.train_loop import build_field, build_renderer

    cfg = Config().apply_overrides([
        "render.pipeline=fused", "field_.view_encoding=sh",
    ])
    field = build_field(cfg)
    with pytest.raises(ValueError, match="view_encoding"):
        build_renderer(cfg, field)
