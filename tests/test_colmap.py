"""COLMAP sparse-model reader tests: a synthetic model written from
known NeRF-convention poses (text AND binary formats) must round-trip
through the reader — poses, intrinsics, depth bounds from points3D —
and train end-to-end via load_data("colmap", ...)."""

import os
import struct

import numpy as np
import pytest
from PIL import Image

from tnerf.data.colmap import (
    load_colmap_scene,
    qvec_to_rotmat,
    rotmat_to_qvec,
)
from tnerf.data.dataset import load_data
from tnerf.data.procedural import frontal_poses

W, H = 20, 14
FX, FY, CX, CY = 24.0, 23.0, 10.5, 6.5


def _w2c(c2w_nerf):
    """NeRF c2w -> COLMAP (R, t) world-to-camera."""
    c = np.array(c2w_nerf, np.float64)
    c[:3, 1] *= -1.0  # NeRF (y up, z back) -> COLMAP (y down, z fwd)
    c[:3, 2] *= -1.0
    R = c[:3, :3].T
    t = -R @ c[:3, 3]
    return R, t


def _write_model(
    tmp_path, poses, points, binary=False, model="PINHOLE", name="scene",
):
    """Write a COLMAP layout: sparse/0 + images/.  Every image observes
    every point (the reader only uses the point ids for depth bounds)."""
    scene = tmp_path / name
    sparse = scene / "sparse" / "0"
    img_dir = scene / "images"
    sparse.mkdir(parents=True)
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = len(poses)
    names = [f"frame_{i:03d}.png" for i in range(n)]
    for nm in names:
        Image.fromarray(
            rng.integers(0, 256, (H, W, 3), dtype=np.uint8), "RGB"
        ).save(img_dir / nm)
    params = (
        [FX, FY, CX, CY] if model == "PINHOLE" else [FX, CX, CY, 0.05]
    )  # else: SIMPLE_RADIAL with a distortion coefficient
    mid = {"PINHOLE": 1, "SIMPLE_RADIAL": 2}[model]
    if binary:
        with open(sparse / "cameras.bin", "wb") as fh:
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<iiQQ", 1, mid, W, H))
            fh.write(struct.pack(f"<{len(params)}d", *params))
        with open(sparse / "images.bin", "wb") as fh:
            fh.write(struct.pack("<Q", n))
            for i, (pose, nm) in enumerate(zip(poses, names)):
                R, t = _w2c(pose)
                q = rotmat_to_qvec(R)
                fh.write(struct.pack("<i", i + 1))
                fh.write(struct.pack("<4d", *q))
                fh.write(struct.pack("<3d", *t))
                fh.write(struct.pack("<i", 1))
                fh.write(nm.encode() + b"\x00")
                fh.write(struct.pack("<Q", len(points)))
                for pid in range(len(points)):
                    fh.write(struct.pack("<ddq", 1.0, 2.0, pid + 1))
        with open(sparse / "points3D.bin", "wb") as fh:
            fh.write(struct.pack("<Q", len(points)))
            for pid, xyz in enumerate(points):
                fh.write(struct.pack("<Q", pid + 1))
                fh.write(struct.pack("<3d", *xyz))
                fh.write(struct.pack("<3B", 128, 128, 128))
                fh.write(struct.pack("<d", 0.5))
                fh.write(struct.pack("<Q", 1))
                fh.write(struct.pack("<ii", 1, 0))
    else:
        with open(sparse / "cameras.txt", "w") as fh:
            fh.write("# cameras\n")
            fh.write(
                f"1 {model} {W} {H} " + " ".join(str(v) for v in params) + "\n"
            )
        with open(sparse / "images.txt", "w") as fh:
            fh.write("# images\n")
            for i, (pose, nm) in enumerate(zip(poses, names)):
                R, t = _w2c(pose)
                q = rotmat_to_qvec(R)
                fh.write(
                    f"{i + 1} " + " ".join(f"{v:.17g}" for v in q) + " "
                    + " ".join(f"{v:.17g}" for v in t) + f" 1 {nm}\n"
                )
                fh.write(
                    " ".join(f"1.0 2.0 {pid + 1}" for pid in range(len(points)))
                    + "\n"
                )
        with open(sparse / "points3D.txt", "w") as fh:
            fh.write("# points\n")
            for pid, xyz in enumerate(points):
                fh.write(
                    f"{pid + 1} " + " ".join(f"{v:.17g}" for v in xyz)
                    + " 128 128 128 0.5 1 0\n"
                )
    return scene


def _expected_bounds(poses, points):
    """Per-image 1/99 depth percentiles of the planted points."""
    out = []
    for pose in poses:
        R, t = _w2c(pose)
        z = np.array([(R @ p + t)[2] for p in points])
        z = z[z > 0]
        out.append(np.percentile(z, [1.0, 99.0]))
    return np.stack(out)


@pytest.mark.parametrize("binary", [False, True])
def test_colmap_roundtrip(tmp_path, binary):
    poses = frontal_poses(9, radius=3.0, seed=1).astype(np.float64)
    points = np.array([
        [0.0, 0.0, 0.0], [0.3, -0.2, 0.1], [-0.4, 0.1, -0.2],
        [0.1, 0.4, 0.3], [0.0, -0.3, -0.4],
    ])
    _write_model(tmp_path, poses, points, binary=binary)
    out = load_colmap_scene(str(tmp_path), "scene")
    assert set(out) == {"train", "test"}
    test_idx = [0, 8]
    train_idx = [i for i in range(9) if i not in test_idx]
    np.testing.assert_allclose(
        out["test"].poses, poses[test_idx], atol=1e-5
    )
    np.testing.assert_allclose(
        out["train"].poses, poses[train_idx], atol=1e-5
    )
    assert out["train"].intrinsics == (FX, FY, CX, CY)
    assert (out["train"].width, out["train"].height) == (W, H)
    exp = _expected_bounds(poses, points)
    np.testing.assert_allclose(
        out["train"].near_far, exp[train_idx], rtol=1e-5
    )
    np.testing.assert_allclose(
        out["test"].near_far, exp[test_idx], rtol=1e-5
    )


def test_colmap_binary_equals_text(tmp_path):
    poses = frontal_poses(5, radius=2.5, seed=2).astype(np.float64)
    points = np.array([[0.0, 0.1, -0.1], [0.2, -0.1, 0.2]])
    _write_model(tmp_path, poses, points, binary=False, name="txt")
    _write_model(tmp_path, poses, points, binary=True, name="bin")
    a = load_colmap_scene(str(tmp_path), "txt")
    b = load_colmap_scene(str(tmp_path), "bin")
    for split in a:
        np.testing.assert_allclose(a[split].poses, b[split].poses, atol=1e-7)
        np.testing.assert_allclose(
            a[split].near_far, b[split].near_far, rtol=1e-7
        )
        assert a[split].intrinsics == b[split].intrinsics


def test_colmap_recenter_rescale_and_dispatch(tmp_path):
    from tnerf.data.llff import poses_avg

    poses = frontal_poses(8, radius=3.0, seed=3).astype(np.float64)
    points = np.array([[0.0, 0.0, 0.0], [0.1, 0.2, -0.1]])
    _write_model(tmp_path, poses, points)
    out = load_data(
        "colmap", "scene", root=str(tmp_path),
        llff={"recenter": True, "bd_rescale": 0.75},
    )
    allp = np.concatenate([out[s].poses for s in ("train", "test") if s in out])
    avg = poses_avg(allp.astype(np.float64))
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    nf = np.concatenate(
        [out[s].near_far for s in ("train", "test") if s in out]
    )
    np.testing.assert_allclose(nf.min(), 1.0 / 0.75, rtol=1e-5)


def test_colmap_distortion_warns_and_multi_camera_rejects(tmp_path):
    poses = frontal_poses(3, radius=3.0, seed=4).astype(np.float64)
    points = np.array([[0.0, 0.0, 0.0]])
    _write_model(tmp_path, poses, points, model="SIMPLE_RADIAL")
    with pytest.warns(UserWarning, match="image_undistorter"):
        out = load_colmap_scene(str(tmp_path), "scene")
    # SIMPLE_RADIAL: one focal expands to fx = fy
    assert out["train"].intrinsics[:2] == (FX, FX)

    cams = tmp_path / "scene" / "sparse" / "0" / "cameras.txt"
    with open(cams, "a") as fh:
        fh.write(f"2 PINHOLE {W} {H} {FX} {FY} {CX} {CY}\n")
    imgs = tmp_path / "scene" / "sparse" / "0" / "images.txt"
    lines = open(imgs).read().splitlines()
    # retarget one image to camera 2
    el = lines[1].split()
    el[8] = "2"
    lines[1] = " ".join(el)
    open(imgs, "w").write("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="single shared camera"):
        load_colmap_scene(str(tmp_path), "scene")


def test_colmap_trains_end_to_end(tmp_path):
    """load_data('colmap') -> run_training with auto near/far: the
    reader's bounds and intrinsics flow through the whole loop."""
    from tnerf.config import Config
    from tnerf.train_loop import run_training

    poses = frontal_poses(5, radius=3.0, seed=5).astype(np.float64)
    points = np.array([
        [0.0, 0.0, 0.0], [0.2, 0.1, -0.1], [-0.1, -0.2, 0.1],
    ])
    _write_model(tmp_path, poses, points)
    cfg = Config().apply_overrides([
        "scene.kind=colmap", "scene.name=scene", f"scene.root={tmp_path}",
        "scene.scene_scale=1.0", "scene.white_background=false",
        "render.white_background=false",
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=8", "sampler.near=-1", "sampler.far=-1",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "grid.resolution=8", "grid.warmup_steps=4", "grid.update_every=4",
        "train.batch_size=64", "train.steps=8", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=4",
        f"logging.out_dir={tmp_path / 'run'}", "render.chunk_size=280",
    ])
    m = run_training(cfg)
    assert np.isfinite(m["psnr_test"])


def test_export_colmap_format_roundtrip(tmp_path):
    """export_colmap_format (the tool behind tools/colmap_rehearsal.py)
    is the exact inverse of the reader: poses, intrinsics, and
    content-derived depth bounds all round-trip through load_data."""
    from tnerf.data.procedural import export_colmap_format, generate_llff_pool

    pool = generate_llff_pool(
        "prims", width=24, height=18, n_views=6, n_samples=32
    )
    export_colmap_format(pool, str(tmp_path / "cm"), n_points=64)
    ds = load_data("colmap", "cm", root=str(tmp_path))
    # holdout_every=8 -> test = view 0 only
    assert len(ds["train"]) == 5 and len(ds["test"]) == 1
    got = np.concatenate([ds["test"].poses, ds["train"].poses])
    np.testing.assert_allclose(got, pool.poses, atol=1e-5)
    assert abs(ds["train"].focal - pool.focal) < 1e-6
    # frontal cameras sit at radius 3.5 looking at content in [-1,1]^3:
    # observed point depths (and so the reader's 1/99-percentile bounds)
    # must land inside the camera's physical depth range
    for split in ("train", "test"):
        nf = ds[split].near_far
        assert nf is not None and nf.min() > 1.0 and nf.max() < 6.0
    # images round-trip through PNG (u8 quantization only)
    np.testing.assert_allclose(
        ds["test"].images[0, ..., :3], pool.images[0], atol=2 / 255
    )
