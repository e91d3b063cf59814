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
