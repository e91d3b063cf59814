"""Mesh-bounded scene tests: tet/OBJ readers + voxelization (the
reference's dead triangle-mesh capability, SURVEY §2.3)."""

import numpy as np
import pytest

from tnerf.config import GridConfig
from tnerf.grid.mesh import (
    fill_interior,
    load_obj,
    load_tet_mesh,
    occupancy_from_mesh,
    voxelize_triangles,
)

CUBE_VERTS = np.asarray(
    [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)],
    np.float32,
)
# 12 triangles of the cube surface
CUBE_FACES = np.asarray(
    [
        (0, 1, 3), (0, 3, 2), (4, 7, 5), (4, 6, 7),  # x faces
        (0, 5, 1), (0, 4, 5), (2, 3, 7), (2, 7, 6),  # y faces
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),  # z faces
    ],
    np.int32,
)


def test_voxelize_cube_shell_and_fill():
    grid = GridConfig(resolution=16)
    shell = voxelize_triangles(CUBE_VERTS, CUBE_FACES, grid)
    # cube spans cells 4..12 in each axis ([-0.5,0.5] of [-1,1] at res 16;
    # the +0.5 face lies exactly on the 11|12 cell boundary -> cell 12)
    assert shell[4, 8, 8] and shell[12, 8, 8]  # on the surface
    assert not shell[8, 8, 8]                   # center is hollow
    assert not shell[0, 0, 0]                   # far outside empty
    solid = fill_interior(shell)
    assert solid[8, 8, 8]                       # interior filled
    assert not solid[0, 0, 0]
    frac = solid.mean()
    assert 0.10 < frac < 0.22  # (8/16)^3 = 0.125 plus shell thickness


def test_occupancy_from_mesh_solid():
    grid = GridConfig(resolution=16)
    occ = occupancy_from_mesh(CUBE_VERTS, CUBE_FACES, grid, solid=True)
    assert occ[8, 8, 8]


def test_tet_reader_roundtrip(tmp_path):
    # one tet in the reference textual format (volume_reader.h)
    path = tmp_path / "one.tet"
    path.write_text(
        "verts 4\n"
        "0 0 0   1 0 0   0 1 0\n"
        "0 0 1\n"
        "tets 1\n"
        "4 0 1 2 3\n"
    )
    verts, faces = load_tet_mesh(str(path))
    assert verts.shape == (4, 3)
    assert faces.shape == (4, 3)  # 4 faces per tet (volume_reader.h:79-82)
    np.testing.assert_array_equal(faces[0], [0, 1, 2])
    np.testing.assert_array_equal(faces[1], [0, 1, 3])


def test_obj_reader(tmp_path):
    path = tmp_path / "quad.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"  # quad -> 2 triangles via fan
    )
    verts, faces = load_obj(str(path))
    assert verts.shape == (4, 3)
    assert faces.shape == (2, 3)
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])


def test_mesh_occupancy_drives_traversal():
    """The voxelized mesh plugs straight into the grid traversal."""
    import jax.numpy as jnp

    from tnerf.grid.traversal import traverse_grid

    grid = GridConfig(resolution=16)
    occ = occupancy_from_mesh(CUBE_VERTS, CUBE_FACES, grid, solid=True)
    o = jnp.asarray([[-2.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    iv = traverse_grid(o, d, grid, occupancy=jnp.asarray(occ))
    m = np.asarray(iv.mask[0])
    ts = np.asarray(iv.t_starts[0])[m]
    te = np.asarray(iv.t_ends[0])[m]
    # ray enters the cube at x=-0.5 (t=1.5) and exits at +0.5 (t=2.5)
    assert abs(ts.min() - 1.5) < 0.13  # within one cell
    assert abs(te.max() - 2.5) < 0.13


def _write_cube_obj(path, verts=None):
    verts = CUBE_VERTS if verts is None else verts
    with open(path, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in CUBE_FACES:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")


def test_dilate_grows_by_one_cell():
    from tnerf.grid.mesh import dilate

    occ = np.zeros((8, 8, 8), bool)
    occ[4, 4, 4] = True
    d1 = dilate(occ, 1)
    assert d1.sum() == 7  # center + 6 face neighbors
    assert dilate(occ, 0).sum() == 1


def test_mesh_occupancy_mask_from_config(tmp_path):
    """grid.mesh_path -> static mask: OBJ dispatch, solid fill, dilation,
    and the empty-voxelization error."""
    import dataclasses

    from tnerf.grid.mesh import mesh_occupancy_mask

    p = tmp_path / "cube.obj"
    _write_cube_obj(p)
    grid = GridConfig(resolution=16, mesh_path=str(p), mesh_dilate=0)
    mask = mesh_occupancy_mask(grid)
    # solid unit cube spans cells 4..11 of 16 over [-1,1]
    assert mask.shape == (16, 16, 16)
    frac = mask.mean()
    assert 0.10 < frac < 0.25  # ~ (8/16)^3 = 0.125 + shell conservatism
    dil = mesh_occupancy_mask(dataclasses.replace(grid, mesh_dilate=1))
    assert dil.sum() > mask.sum()
    assert (dil | mask).sum() == dil.sum()  # superset
    shell = mesh_occupancy_mask(dataclasses.replace(grid, mesh_solid=False))
    assert 0 < shell.sum() < mask.sum()
    # no mesh -> no mask
    assert mesh_occupancy_mask(GridConfig(resolution=16)) is None
    # mesh outside the AABB -> explicit error
    far = tmp_path / "far.obj"
    _write_cube_obj(far, CUBE_VERTS + 10.0)
    with pytest.raises(ValueError, match="empty"):
        mesh_occupancy_mask(
            dataclasses.replace(grid, mesh_path=str(far))
        )


def test_update_occupancy_respects_mask():
    """With a static mask, neither the bitfield nor the EMA can escape
    it, no matter how much density blooms outside — and the density_cdf
    payload derives the same masked bits at the dense start."""
    import jax
    import jax.numpy as jnp

    from tnerf.config import Config
    from tnerf.grid.occupancy import (
        init_occupancy,
        renderer_payload,
        update_occupancy,
    )
    from tnerf.render.grid_renderer import split_occupancy_payload

    grid = GridConfig(resolution=8)
    mask = np.zeros((8, 8, 8), bool)
    mask[2:6, 2:6, 2:6] = True
    occ0 = init_occupancy(grid, mask)
    np.testing.assert_array_equal(np.asarray(occ0.bitfield), mask)
    # dense-start density_cdf payload derives the masked bits
    cfg = Config().apply_overrides([
        "grid.resolution=8", "sampler.placement=density_cdf",
    ])
    bits0, _ = split_occupancy_payload(
        renderer_payload(occ0, cfg.sampler, grid), grid
    )
    np.testing.assert_array_equal(np.asarray(bits0), mask)
    # density high EVERYWHERE: update must stay inside the mask
    occ1 = update_occupancy(
        occ0, lambda x: jnp.full(x.shape[:-1], 100.0), grid,
        jax.random.PRNGKey(0), mask=mask,
    )
    np.testing.assert_array_equal(np.asarray(occ1.bitfield), mask)
    assert float(jnp.abs(jnp.where(jnp.asarray(mask), 0.0,
                                   occ1.density_ema)).max()) == 0.0


def test_run_training_mesh_bounded(tmp_path):
    """End-to-end: grid.mesh_path bounds a training run — finite PSNR,
    and the final checkpointed bitfield is a subset of the mask."""
    from tnerf.config import Config
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training
    from tnerf.utils.checkpoint import latest_checkpoint

    p = tmp_path / "bound.obj"
    # a big cube bounding the whole procedural scene content
    _write_cube_obj(p, CUBE_VERTS * 1.9)
    scene = generate_procedural_scene(
        width=24, height=24, n_train=3, n_val=0, n_test=1, n_samples=64
    )
    out = tmp_path / "run"
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=16", "sampler.near=2.0", "sampler.far=5.5",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        f"grid.mesh_path={p}", "grid.mesh_dilate=0",
        "train.batch_size=128", "train.steps=16", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=8",
        f"logging.out_dir={out}", "render.chunk_size=576",
    ])
    m = run_training(cfg, datasets=scene)
    assert np.isfinite(m["psnr_test"])
    from tnerf.grid.mesh import mesh_occupancy_mask

    mask = mesh_occupancy_mask(cfg.grid)
    found = latest_checkpoint(str(out / "checkpoints"))
    assert found is not None
    with np.load(found[1]) as data:
        arrs = [data[k] for k in data.files]
    bitfields = [
        a for a in arrs if a.dtype == bool and a.shape == (8, 8, 8)
    ]
    assert bitfields and all((b & ~mask).sum() == 0 for b in bitfields)
