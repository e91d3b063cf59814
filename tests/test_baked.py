"""Baked-field fast renderer (tnerf/render/baked.py): lookup-mode
exactness, parity of the baked render against the direct march render
of the same field, and the `cli bake --eval` artifact flow.  The role
match is the reference's interactive render intent
(main.cu:19-21, optixPrograms.cu:43-116) — SURVEY §4 unit strategy."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnerf.config import Config, GridConfig
from tnerf.render.baked import (
    BakedField,
    bake_field,
    bake_positions,
    brick_pack,
    make_baked_renderer,
)


def _linear_table(R, grid):
    """Bake a field that is LINEAR in position: trilinear interpolation
    must reproduce it exactly (the classic interpolation oracle)."""
    pts = np.asarray(bake_positions(R, grid))
    rgb = 0.5 + 0.1 * pts  # linear per channel
    sigma = 1.0 + pts @ np.asarray([0.3, -0.2, 0.1], np.float32)
    return jnp.asarray(
        np.concatenate([rgb, sigma[:, None]], axis=1).astype(np.float32)
    )


def test_trilinear_reproduces_linear_field_exactly():
    grid = GridConfig(resolution=16)
    R = 9
    table = _linear_table(R, grid)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    bf = BakedField(bake_res=R, grid=grid, mode="trilinear")
    rgb, sigma = bf.apply({"table": table}, p)
    exp_rgb = 0.5 + 0.1 * np.asarray(p)
    exp_sig = 1.0 + np.asarray(p) @ np.asarray([0.3, -0.2, 0.1], np.float32)
    np.testing.assert_allclose(np.asarray(rgb), exp_rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma), exp_sig, atol=1e-5)


def test_brick_mode_matches_plain_trilinear():
    grid = GridConfig(resolution=16)
    R = 8
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(0, 1, (R ** 3, 4)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (5, 37, 3)).astype(np.float32))
    tri = BakedField(bake_res=R, grid=grid, mode="trilinear")
    brick = BakedField(bake_res=R, grid=grid, mode="trilinear_brick")
    r1, s1 = tri.apply({"table": table}, p)
    r2, s2 = brick.apply({"table": brick_pack(table, R)}, p)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_nearest_at_vertices_returns_table_rows():
    grid = GridConfig(resolution=16)
    R = 7
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(0, 1, (R ** 3, 4)).astype(np.float32))
    pts = bake_positions(R, grid)
    bf = BakedField(bake_res=R, grid=grid, mode="nearest")
    rgb, sigma = bf.apply({"table": table}, pts)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(table[:, 0:3]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(table[:, 3]),
                               atol=1e-6)


class _AnalyticField:
    """Duck-typed field over the procedural analytic GT — the bake
    oracle: baked renders of it must match direct renders of it."""

    def apply(self, params, positions, viewdirs=None):
        from tnerf.data.procedural import analytic_field

        return analytic_field(positions)


@pytest.mark.parametrize("mode", ["trilinear", "trilinear_brick"])
def test_baked_render_matches_direct_render(mode):
    """Bake the analytic field at 64^3 and render; compare against the
    march render of the same analytic field at the same quadrature.
    The only error source is grid quantization — must stay small."""
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.data.procedural import analytic_field
    from tnerf.grid.occupancy import cell_centers
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        "grid.resolution=32", "scene.scene_scale=1.0",
        "sampler.samples_per_ray=64", "sampler.near=2.0", "sampler.far=5.5",
        "sampler.tighten=false", "sampler.occupancy_mask_res=0",
        "render.pipeline=grid_march", "render.ray_compact=false",
        "render.compact=false",
    ])
    _, sigma = analytic_field(cell_centers(cfg.grid).reshape(-1, 3))
    occ = jnp.asarray((np.asarray(sigma) > 0.5).reshape(32, 32, 32))

    field = _AnalyticField()
    table = bake_field(field, {}, cfg.grid, bake_res=64, occupancy=occ)
    brend = make_baked_renderer(
        table, 64, cfg.grid, cfg.sampler, cfg.render, mode=mode
    )
    drend = make_grid_renderer(
        field, cfg.grid, cfg.sampler, cfg.render, strategy="march",
        compact=False,
    )

    rng = np.random.default_rng(3)
    o = rng.uniform(-1, 1, (128, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = Rays(
        origins=jnp.asarray(o, jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        viewdirs_tp=viewdirs_to_thetaphi(jnp.asarray(d, jnp.float32)),
    )
    rb = brend(brend.params, rays, None, occ)
    rd = drend({}, rays, None, occ)
    err = float(jnp.abs(rb.rgb - rd.rgb).max())
    mse = float(jnp.mean((rb.rgb - rd.rgb) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 30.0, (mode, psnr, err)


def test_cli_bake_eval_writes_artifacts(tmp_path):
    """Train a tiny run, then `cli bake --eval`: npz written under
    baked/, baked_parity.json written with a finite parity_db."""
    from tnerf.cli import main

    out = str(tmp_path / "run")
    base = [
        "--override", "scene.kind=procedural",
        "--override", "scene.name=prims",
        "--override", "scene.scene_scale=1.0",
        "--override", "scene.proc_width=24",
        "--override", "scene.proc_height=24",
        "--override", "scene.proc_n_train=2",
        "--override", "scene.proc_n_val=0",
        "--override", "scene.proc_n_test=1",
        "--override", "render.pipeline=grid_march",
        "--override", "render.ray_compact=false",
        "--override", "render.compact=false",
        "--override", "sampler.samples_per_ray=16",
        "--override", "sampler.near=2.0", "--override", "sampler.far=5.5",
        "--override", "field_.hidden_width=16",
        "--override", "field_.hidden_layers=1",
        "--override", "field_.n_frequencies=2",
        "--override", "grid.resolution=8",
        "--override", "grid.warmup_steps=4",
        "--override", "grid.update_every=4",
        "--override", "train.batch_size=64",
        "--override", "train.steps=8",
        "--override", "train.eval_every=0",
        "--override", "train.checkpoint_every=0",
        "--override", "train.log_every=4",
        "--override", "render.chunk_size=576",
        "--override", f"logging.out_dir={out}",
    ]
    assert main(["train", *base]) == 0
    assert main(["bake", "--bake-res", "16", "--eval", *base]) == 0
    import os

    assert os.path.exists(os.path.join(out, "baked", "baked_16.npz"))
    art = json.load(open(os.path.join(out, "baked_parity.json")))
    assert np.isfinite(art["parity_db"])
    assert art["bake_res"] == 16
    assert "psnr_test" in art["baked"] and "psnr_test" in art["march"]
