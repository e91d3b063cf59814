"""Multi-chip DP on a virtual 8-device CPU mesh (SURVEY §4): sharded
training must be numerically equivalent to single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnerf.config import Config
from tnerf.data.procedural import generate_procedural_scene
from tnerf.fields.nerf_field import NeRFField
from tnerf.parallel.mesh import (
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from tnerf.render.renderer import make_uniform_renderer
from tnerf.train import PixelSampler, create_optimizer, init_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = Config().apply_overrides([
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=32", "field_.hidden_layers=2", "field_.n_frequencies=4",
        "train.batch_size=256", "scene.scene_scale=1.0",
    ])
    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=0, n_test=1, n_samples=64
    )
    field = NeRFField(cfg.field_, cfg.grid)
    renderer = make_uniform_renderer(field, cfg.sampler, cfg.render)
    optimizer = create_optimizer(cfg.train)
    state = init_train_state(field, optimizer, cfg.train.seed)
    sampler = PixelSampler(scene["train"], 1.0, True)
    return cfg, renderer, optimizer, state, sampler


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8  # conftest forces this
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}


def test_dp_step_matches_single_device(setup):
    cfg, renderer, optimizer, state, sampler = setup
    mesh = make_mesh()
    train_step = make_train_step(renderer, optimizer)
    dp_step = make_dp_train_step(train_step, mesh)

    key = jax.random.PRNGKey(0)
    batch = sampler.sample(key, cfg.train.batch_size)

    new_single, aux_single = train_step(state, batch, key)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    new_dp, aux_dp = dp_step(state_r, batch_s, replicate(key, mesh))

    np.testing.assert_allclose(
        float(aux_single["loss"]), float(aux_dp["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(new_single.params), jax.tree.leaves(new_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_multiple_steps_stay_in_sync(setup):
    cfg, renderer, optimizer, state, sampler = setup
    mesh = make_mesh()
    train_step = make_train_step(renderer, optimizer)
    dp_step = make_dp_train_step(train_step, mesh)
    state_dp = replicate(state, mesh)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k1, k2 = jax.random.split(key, 3)
        batch = sampler.sample(k1, cfg.train.batch_size)
        state, aux = train_step(state, batch, k2)
        state_dp, aux_dp = dp_step(state_dp, shard_batch(batch, mesh), replicate(k2, mesh))
    np.testing.assert_allclose(
        float(aux["loss"]), float(aux_dp["loss"]), rtol=1e-4
    )


def test_dp_render_sharded_matches_single(setup):
    """Sharded full-image rendering (eval-time DP) must match the
    unsharded renderer."""
    from tnerf.parallel.mesh import dp_render_sharded, make_mesh, replicate

    cfg, renderer, optimizer, state, sampler = setup
    mesh = make_mesh()
    key = jax.random.PRNGKey(2)
    batch = sampler.sample(key, 512)  # 512 rays: divisible by 8 devices
    want = renderer(state.params, batch.rays, None, None)
    dp = dp_render_sharded(renderer, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rays_s = jax.device_put(batch.rays, NamedSharding(mesh, P("data")))
    got = dp(replicate(state.params, mesh), rays_s, None, None)
    # separate compilations fuse differently: bf16-matmul-level tolerance
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.acc), np.asarray(want.acc), atol=1e-3)


def test_dp_train_step_fused_pipeline():
    """Data-parallel training THROUGH the fused Pallas kernel (custom-VJP
    forward+backward) on the 8-device mesh: the pallas_call must compose
    with the GSPMD sharding constraints, and one sharded step must match
    the unsharded step."""
    import jax.numpy as jnp

    from tnerf.config import Config
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.parallel.mesh import (
        make_dp_train_step, make_mesh, replicate, shard_batch,
    )
    from tnerf.render.pallas_fused2 import make_fused_pipeline_renderer_v2
    from tnerf.train import (
        PixelSampler, create_optimizer, init_train_state, make_train_step,
    )

    cfg = Config().apply_overrides([
        "sampler.samples_per_ray=128", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4", "grid.resolution=16",
        "scene.scene_scale=1.0", "train.batch_size=128",
    ])
    scene = generate_procedural_scene(
        width=16, height=16, n_train=2, n_val=0, n_test=0, n_samples=32
    )
    field = NeRFField(cfg.field_, cfg.grid)
    rend = make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render,
        b_tile=8, b_tile_bwd=8, interpret=True,
    )
    opt = create_optimizer(cfg.train)
    state = init_train_state(field, opt, 0)
    occ = jnp.ones((16,) * 3, bool)
    step = make_train_step(rend, opt)
    mesh = make_mesh(8)
    dp_step = make_dp_train_step(step, mesh, with_occupancy=True)

    sampler = PixelSampler(scene["train"], 1.0, True)
    batch = sampler.sample(jax.random.PRNGKey(0), cfg.train.batch_size)
    key = jax.random.PRNGKey(1)
    _, aux = step(state, batch, key, occ)
    _, aux_dp = dp_step(
        replicate(state, mesh), shard_batch(batch, mesh),
        replicate(key, mesh), replicate(occ, mesh),
    )
    np.testing.assert_allclose(float(aux["loss"]), float(aux_dp["loss"]), rtol=1e-4)


def test_dp_train_step_hashgrid_onehot():
    """Data-parallel training of the hash-grid field with the MXU one-hot
    encoding (hand-written VJP) — the custom_vjp must compose with the
    GSPMD sharding constraints and match the unsharded step."""
    import jax.numpy as jnp

    from tnerf.config import Config
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.parallel.mesh import (
        make_dp_train_step, make_mesh, replicate, shard_batch,
    )
    from tnerf.render.grid_renderer import make_grid_renderer
    from tnerf.train import (
        PixelSampler, create_optimizer, init_train_state, make_train_step,
    )

    cfg = Config().apply_overrides([
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.encoding=hashgrid", "field_.hash_gather_mode=onehot",
        "field_.hash_levels=4", "field_.hash_log2_table_size=10",
        "field_.hash_base_resolution=4", "field_.hash_max_resolution=32",
        "field_.hash_hidden_width=32", "field_.hash_hidden_layers=2",
        "grid.resolution=16", "scene.scene_scale=1.0", "train.batch_size=64",
    ])
    scene = generate_procedural_scene(
        width=16, height=16, n_train=2, n_val=0, n_test=0, n_samples=32
    )
    field = NeRFField(cfg.field_, cfg.grid, arch="twobranch")
    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="march", compact=False)
    opt = create_optimizer(cfg.train)
    state = init_train_state(field, opt, 0)
    occ = jnp.ones((16,) * 3, bool)
    step = make_train_step(rend, opt)
    mesh = make_mesh(8)
    dp_step = make_dp_train_step(step, mesh, with_occupancy=True)

    sampler = PixelSampler(scene["train"], 1.0, True)
    batch = sampler.sample(jax.random.PRNGKey(0), cfg.train.batch_size)
    key = jax.random.PRNGKey(1)
    _, aux = step(state, batch, key, occ)
    _, aux_dp = dp_step(
        replicate(state, mesh), shard_batch(batch, mesh),
        replicate(key, mesh), replicate(occ, mesh),
    )
    np.testing.assert_allclose(float(aux["loss"]), float(aux_dp["loss"]), rtol=1e-4)


def test_dp_render_sharded_with_ray_compaction():
    """Eval-time DP composes with the round-3 ray-compaction path: the
    tighten+mask kernel, per-shard cumsum compaction, and scatter-back
    must all compile and match the unsharded render under the mesh."""
    from tnerf.cameras import Rays, viewdirs_to_thetaphi
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.parallel.mesh import dp_render_sharded, make_mesh, replicate
    from tnerf.render.grid_renderer import make_grid_renderer

    res = 32
    cfg = Config().apply_overrides([
        f"grid.resolution={res}", "sampler.samples_per_ray=32",
        "sampler.near=0.05", "scene.scene_scale=1.0",
        "field_.hidden_width=32", "field_.hidden_layers=2",
        "field_.n_frequencies=4",
        "sampler.tighten_res=16", "sampler.occupancy_mask_res=16",
        "render.ray_compact=true", "render.ray_compact_fraction=0.9",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(61)
    occ = np.zeros((res, res, res), bool)
    occ[10:22, 10:22, 10:22] = True
    occ = jnp.asarray(occ)
    o = rng.uniform(-1, 1, (512, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = d + rng.normal(0, 0.2, d.shape)
    d = jnp.asarray(d, jnp.float32)
    rays = Rays(origins=jnp.asarray(o, jnp.float32), directions=d,
                viewdirs_tp=viewdirs_to_thetaphi(d))

    rend = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                              strategy="march", compact=False)
    want = rend(params, rays, None, occ)
    mesh = make_mesh()
    dp = dp_render_sharded(rend, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rays_s = jax.device_put(rays, NamedSharding(mesh, P("data")))
    got = dp(replicate(params, mesh), rays_s, None,
             replicate(occ, mesh))
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb),
                               atol=1e-3)


@pytest.mark.parametrize("mesh_axes", ["1d", "2d"])
def test_sharded_occupancy_update_matches_replicated(mesh_axes):
    """SURVEY §2.4 sharded occupancy refresh: probing cells sharded over
    the mesh (1-D data, or 2-D data x sample) must reproduce the
    single-device update_occupancy exactly — same jitter key, same probe
    set, each position evaluated by one chip."""
    from tnerf.grid.occupancy import init_occupancy, update_occupancy
    from tnerf.parallel.occupancy import make_sharded_occupancy_update

    cfg = Config().apply_overrides([
        "grid.resolution=12",  # 12^3 = 1728: NOT divisible by 8 -> pads
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(3))
    mesh = (
        make_mesh(8, "data") if mesh_axes == "1d"
        else make_mesh(4, "data", "sample", 2)
    )
    mask = np.zeros((12, 12, 12), bool)
    mask[2:10, 2:10, 2:10] = True

    for m in (None, mask):
        occ0 = init_occupancy(cfg.grid, m)
        key = jax.random.PRNGKey(7)
        # jit the reference exactly like train_loop's replicated path:
        # jit-vs-eager fusion of the jitter arithmetic shifts probe
        # positions by 1 ulp (see docs/ROUND3.md parity note)
        ref_step = jax.jit(
            lambda s, p, k: update_occupancy(
                s, lambda x: field.density(p, x), cfg.grid, k, mask=m
            )
        )
        ref = ref_step(occ0, params, key)
        upd = make_sharded_occupancy_update(
            lambda p, x: field.density(p, x), cfg.grid, mesh, mask=m
        )
        got = upd(replicate(occ0, mesh), replicate(params, mesh),
                  replicate(key, mesh))
        np.testing.assert_allclose(
            np.asarray(got.density_ema), np.asarray(ref.density_ema),
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(got.bitfield), np.asarray(ref.bitfield)
        )
        assert int(got.step) == 1
        # a second update chains on the sharded EMA
        got2 = upd(got, replicate(params, mesh), replicate(key, mesh))
        ref2 = ref_step(ref, params, key)
        np.testing.assert_allclose(
            np.asarray(got2.density_ema), np.asarray(ref2.density_ema),
            atol=1e-6,
        )
