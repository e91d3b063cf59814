"""Isosurface extraction (marching tetrahedra): geometric accuracy on
an analytic sphere, watertightness/orientation invariants, the OBJ
round trip back through the mesh-bounded input path, and the CLI."""

import numpy as np
import pytest

from tnerf.config import GridConfig
from tnerf.grid.marching import (
    extract_density_mesh,
    marching_tetrahedra,
    save_obj,
)


def _sphere_values(n=33, r=0.6):
    ax = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    # high inside, low outside (density-like)
    return r - np.sqrt(x * x + y * y + z * z), ax[1] - ax[0]


def test_sphere_vertices_on_radius():
    vals, h = _sphere_values()
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(-1.0, -1.0, -1.0), spacing=(h, h, h)
    )
    assert len(faces) > 100
    rad = np.linalg.norm(verts, axis=1)
    # linear interpolation on a curved surface: error O(h^2), bound by h
    np.testing.assert_allclose(rad, 0.6, atol=h)


def test_sphere_watertight_and_manifold():
    """Every mesh edge is shared by exactly 2 triangles (closed surface)
    and Euler characteristic V - E + F == 2 (genus 0)."""
    vals, h = _sphere_values()
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(-1.0, -1.0, -1.0), spacing=(h, h, h)
    )
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    key = np.sort(e, axis=1)
    _, counts = np.unique(
        key[:, 0].astype(np.int64) * len(verts) + key[:, 1],
        return_counts=True,
    )
    assert (counts == 2).all()
    n_edges = counts.shape[0]
    n_used_verts = np.unique(faces).shape[0]
    assert n_used_verts - n_edges + len(faces) == 2


def test_sphere_normals_point_outward():
    vals, h = _sphere_values()
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(-1.0, -1.0, -1.0), spacing=(h, h, h)
    )
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    cen = (v0 + v1 + v2) / 3.0  # sphere centered at origin
    assert (np.einsum("ij,ij->i", nrm, cen) > 0).all()


def test_surface_position_exact_on_planar_field():
    """A linear field's isosurface is a plane; linear interpolation is
    exact there — every vertex sits on x = 0.35 to fp precision."""
    n = 9
    ax = np.linspace(0.0, 1.0, n, dtype=np.float32)
    x = np.meshgrid(ax, ax, ax, indexing="ij")[0]
    verts, faces = marching_tetrahedra(
        0.35 - x, 0.0, origin=(0, 0, 0), spacing=(1 / (n - 1),) * 3
    )
    assert len(faces) > 0
    np.testing.assert_allclose(verts[:, 0], 0.35, atol=1e-6)


def test_empty_and_full_levels():
    vals, h = _sphere_values(n=9)
    for level in (10.0, -10.0):  # all-outside / all-inside
        verts, faces = marching_tetrahedra(vals, level)
        assert len(verts) == 0 and len(faces) == 0


def test_obj_round_trip_through_mesh_input_path(tmp_path):
    """The exported OBJ reloads through grid/mesh.py and voxelizes to an
    occupancy shell consistent with the analytic sphere."""
    from tnerf.grid.mesh import load_obj, occupancy_from_mesh

    vals, h = _sphere_values()
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(-1.0, -1.0, -1.0), spacing=(h, h, h)
    )
    path = str(tmp_path / "sphere.obj")
    save_obj(path, verts, faces)
    v2, f2 = load_obj(path)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    assert (f2 == faces).all()
    grid = GridConfig(resolution=16)
    occ = occupancy_from_mesh(v2, f2, grid, solid=True)
    ax = (np.arange(16) + 0.5) / 16 * 2.0 - 1.0
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    want = np.sqrt(x * x + y * y + z * z) <= 0.6
    # voxelization is conservative: everything inside must be covered,
    # the shell may overhang by ~a cell
    assert occ[want].all()
    assert occ.mean() < want.mean() * 2.5


def test_extract_density_mesh_from_field():
    """Analytic density through the extract glue: radius recovered."""
    grid = GridConfig(resolution=8)  # AABB [-1, 1]^3

    def density(pts):
        return 5.0 * (0.5 - np.linalg.norm(pts, axis=-1))

    verts, faces = extract_density_mesh(density, grid, resolution=24, level=0.0)
    assert len(faces) > 0
    np.testing.assert_allclose(
        np.linalg.norm(verts, axis=1), 0.5, atol=2.0 / 24
    )


def test_cli_mesh_subcommand(tmp_path):
    """Train a tiny field via the library, then extract its mesh via the
    CLI — no dataset needed at mesh time."""
    import json

    from tnerf.cli import main
    from tnerf.config import Config
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.grid.mesh import load_obj
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    out = str(tmp_path / "run")
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.n_frequencies=4", "field_.hidden_width=32",
        "field_.hidden_layers=2",
        "train.batch_size=256", "train.steps=60", "train.eval_every=0",
        "train.checkpoint_every=60", "train.log_every=30",
        f"logging.out_dir={out}", "render.chunk_size=1024",
    ])
    run_training(cfg, datasets=scene)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        fh.write(json.dumps(json.loads(cfg.to_json())))
    obj = str(tmp_path / "scene.obj")
    # threshold above the under-trained background floor (~0.2 at 60
    # steps) but below the object peak, so a surface exists
    rc = main([
        "mesh", "--config", cfg_path, "--checkpoint", f"{out}/checkpoints",
        "--out", obj, "--resolution", "32", "--threshold", "0.5",
    ])
    assert rc == 0
    verts, faces = load_obj(obj)
    assert len(faces) > 0
    # the extracted geometry stays inside the AABB
    assert (np.abs(verts) <= 1.0 + 1e-5).all()


def test_thin_sheet_winding_consistent():
    """A one-vertex-thick density sheet: the inside vertices' central
    differences cancel, so orientation must come from BOTH edge
    endpoints.  Consistency criterion: on a consistently-oriented
    closed mesh every undirected edge appears exactly once per
    direction (once as (a,b), once as (b,a))."""
    n = 12
    vals = np.full((n, n, n), -1.0, np.float32)
    vals[2:-2, 2:-2, 6] = 1.0  # single-layer sheet, z = const, closed
    verts, faces = marching_tetrahedra(vals, 0.0)
    assert len(faces) > 0
    directed = {}
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            directed[(int(a), int(b))] = directed.get((int(a), int(b)), 0) + 1
    for (a, b), c in directed.items():
        assert c == 1, "duplicate directed edge -> inconsistent winding"
        assert directed.get((b, a), 0) == 1, "unpaired edge"
    # and the normals actually point AWAY from the sheet (outward):
    # z-component sign matches the side of the sheet plane
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    cen_z = (v0[:, 2] + v1[:, 2] + v2[:, 2]) / 3.0
    side = np.sign(cen_z - 6.0)
    keep = np.abs(nrm[:, 2]) > 1e-6 * np.linalg.norm(nrm, axis=1)
    assert (np.sign(nrm[keep, 2]) == side[keep]).all()


def test_vertex_normals_sphere_point_outward():
    from tnerf.grid.marching import vertex_normals

    vals, h = _sphere_values()
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(-1.0, -1.0, -1.0), spacing=(h, h, h)
    )
    n = vertex_normals(verts, faces)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    # on a sphere the outward normal is the radial direction
    r = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    cos = np.einsum("ij,ij->i", n, r)
    assert cos.min() > 0.8 and cos.mean() > 0.98


def test_colored_obj_round_trip(tmp_path):
    """Vertex colors write as the `v x y z r g b` extension; load_obj
    still reads the geometry (ignoring the color columns)."""
    from tnerf.grid.mesh import load_obj

    vals, h = _sphere_values(n=9)
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(-1.0, -1.0, -1.0), spacing=(h, h, h)
    )
    colors = np.random.RandomState(0).rand(len(verts), 3).astype(np.float32)
    path = str(tmp_path / "colored.obj")
    save_obj(path, verts, faces, colors)
    with open(path) as fh:
        vline = next(l for l in fh if l.startswith("v "))
    assert len(vline.split()) == 7  # v x y z r g b
    v2, f2 = load_obj(path)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    assert (f2 == faces).all()


def test_cli_mesh_vertex_colors(tmp_path):
    """--vertex-colors bakes field RGB: on the procedural scene the
    exported colors are real (non-constant, in [0,1])."""
    import json

    from tnerf.cli import main
    from tnerf.config import Config
    from tnerf.data.procedural import generate_procedural_scene
    from tnerf.train_loop import run_training

    scene = generate_procedural_scene(
        width=24, height=24, n_train=4, n_val=1, n_test=1, n_samples=64
    )
    out = str(tmp_path / "run")
    cfg = Config().apply_overrides([
        "scene.kind=procedural", "scene.scene_scale=1.0",
        "render.pipeline=grid_march",
        "grid.resolution=8", "grid.warmup_steps=5", "grid.update_every=5",
        "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
        "field_.n_frequencies=4", "field_.hidden_width=32",
        "field_.hidden_layers=2",
        "train.batch_size=256", "train.steps=60", "train.eval_every=0",
        "train.checkpoint_every=60", "train.log_every=30",
        f"logging.out_dir={out}", "render.chunk_size=1024",
    ])
    run_training(cfg, datasets=scene)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        fh.write(json.dumps(json.loads(cfg.to_json())))
    obj = str(tmp_path / "colored.obj")
    rc = main([
        "mesh", "--config", cfg_path, "--checkpoint", f"{out}/checkpoints",
        "--out", obj, "--resolution", "24", "--threshold", "0.5",
        "--vertex-colors",
    ])
    assert rc == 0
    cols = []
    with open(obj) as fh:
        for line in fh:
            p = line.split()
            if p and p[0] == "v":
                assert len(p) == 7
                cols.append([float(x) for x in p[4:]])
    cols = np.asarray(cols)
    assert len(cols) > 0
    assert (cols >= 0).all() and (cols <= 1).all()
    assert cols.std(axis=0).max() > 0.01  # not a constant bake
