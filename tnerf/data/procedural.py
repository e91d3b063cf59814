"""Procedural analytic scenes + ground-truth renderer.

The build environment has no NeRF-synthetic data on disk and no network
egress, so end-to-end training, eval, and benchmarking need a hermetic
data source.  This module defines analytic density/color fields (soft
colored primitives inside the [-1,1]^3 grid box), renders ground-truth
images with the exact same quadrature as the framework's renderer
(tnerf.render.composite), and packages them as `ImageDataset` splits —
bit-identical in structure to what the NeRF-synthetic reader produces, and
exportable to disk in NeRF-synthetic format (transforms_*.json + PNGs) so
the loader round-trips (reference format: loader/data_loader.cpp:34-94).

Camera rig matches NeRF-synthetic conventions: cameras on a sphere of
radius ~3.5 looking at the origin, camera_angle_x = 0.6911112 (lego's).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tnerf.cameras import camera_rays, focal_from_angle
from tnerf.data.dataset import ImageDataset
from tnerf.render.composite import composite

CAMERA_ANGLE_X = 0.6911112070083618  # lego's horizontal FoV


# --------------------------------------------------------------------------
# Analytic fields
# --------------------------------------------------------------------------

def _sphere_sdf(x, center, radius):
    return jnp.linalg.norm(x - jnp.asarray(center), axis=-1) - radius


def _box_sdf(x, center, half):
    q = jnp.abs(x - jnp.asarray(center)) - jnp.asarray(half)
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


_PRIMS = (
    # (sdf_fn, color)
    (partial(_sphere_sdf, center=(0.35, 0.0, 0.1), radius=0.32), (0.9, 0.25, 0.2)),
    (partial(_sphere_sdf, center=(-0.3, 0.3, -0.2), radius=0.26), (0.2, 0.55, 0.95)),
    (partial(_box_sdf, center=(-0.1, -0.35, 0.25), half=(0.3, 0.16, 0.2)), (0.3, 0.85, 0.35)),
    (partial(_box_sdf, center=(0.0, 0.0, -0.45), half=(0.55, 0.55, 0.08)), (0.9, 0.8, 0.3)),
)


def _cylinder_sdf(x, center, axis: int, radius, half_len):
    """Capped cylinder along coordinate `axis`."""
    c = jnp.asarray(center)
    d = x - c
    perp = [i for i in range(3) if i != axis]
    radial = jnp.sqrt(d[..., perp[0]] ** 2 + d[..., perp[1]] ** 2) - radius
    axial = jnp.abs(d[..., axis]) - half_len
    return jnp.maximum(radial, axial)


# Hard scene (quality-gate hardening): thin rods ~<= 1 cell of a 128^3 grid
# (cell = 2/128 ~ 0.0156; rod radius 0.015), a sphere and ground slab with
# high-frequency sin-product texture, rendered over a BLACK background.
# The easy `prims` scene has none of these failure modes (no thin
# structure, no high-frequency content, white background).
_HARD_RODS = (
    ((0.45, -0.35, -0.05), 2, 0.015, 0.42),
    ((-0.5, 0.1, 0.15), 0, 0.015, 0.45),
    ((0.05, 0.5, 0.3), 1, 0.015, 0.4),
    ((-0.15, -0.5, 0.05), 2, 0.022, 0.5),
    ((0.3, 0.25, 0.42), 0, 0.022, 0.5),
)
_HARD_PRIMS = (
    (partial(_sphere_sdf, center=(0.0, 0.0, 0.05), radius=0.3), (0.85, 0.3, 0.25)),
    (partial(_box_sdf, center=(0.0, 0.0, -0.5), half=(0.6, 0.6, 0.06)), (0.35, 0.5, 0.9)),
)
_ROD_COLORS = (
    (0.95, 0.8, 0.2), (0.2, 0.9, 0.5), (0.9, 0.3, 0.8),
    (0.25, 0.7, 0.95), (0.95, 0.45, 0.15),
)


def analytic_field_hard(x: jnp.ndarray, sharpness: float = 220.0,
                        density_scale: float = 160.0):
    """Hard analytic field: thin rods + high-frequency texture.

    Same contract as analytic_field.  Colors carry a sin-product checker
    (frequency ~22 rad/unit: ~25 periods across the box — well into the
    upper frequency bands of the L=10 encoding / fine hash levels)."""
    prims = list(_HARD_PRIMS) + [
        (partial(_cylinder_sdf, center=center, axis=axis, radius=radius,
                 half_len=half), col)
        for (center, axis, radius, half), col in zip(_HARD_RODS, _ROD_COLORS)
    ]
    rgb, sigma = _soft_union_field(prims, x, sharpness, density_scale)
    f = 22.0
    checker = 0.55 + 0.45 * jnp.sin(f * x[..., 0]) * jnp.sin(f * x[..., 1] + 1.3) \
        * jnp.sin(f * x[..., 2] + 2.1)
    rgb = jnp.clip(rgb * checker[..., None], 0.0, 1.0)
    return rgb, sigma


def analytic_field(x: jnp.ndarray, sharpness: float = 60.0, density_scale: float = 45.0):
    """Analytic ground-truth radiance field.

    x: [..., 3] positions. Returns (rgb [..., 3], sigma [...]).
    Density is a smooth indicator of the union of primitives; color is the
    softmin-weighted blend of primitive colors (_soft_union_field — ONE
    copy of the union contract for every scene).
    """
    return _soft_union_field(_PRIMS, x, sharpness, density_scale)


def _torus_sdf(x, center, axis: int, R, r):
    """Torus of major radius R, tube radius r, in the plane through
    `center` perpendicular to coordinate `axis`."""
    c = jnp.asarray(center)
    d = x - c
    perp = [i for i in range(3) if i != axis]
    ring = jnp.sqrt(d[..., perp[0]] ** 2 + d[..., perp[1]] ** 2) - R
    return jnp.sqrt(ring ** 2 + d[..., axis] ** 2) - r


_RING_PRIMS = (
    (partial(_torus_sdf, center=(0.0, 0.0, 0.0), axis=2, R=0.45, r=0.09),
     (0.9, 0.35, 0.2)),
    (partial(_torus_sdf, center=(0.0, 0.0, 0.0), axis=0, R=0.32, r=0.07),
     (0.25, 0.6, 0.95)),
    (partial(_torus_sdf, center=(0.1, -0.1, 0.2), axis=1, R=0.22, r=0.06),
     (0.3, 0.9, 0.4)),
    (partial(_sphere_sdf, center=(0.0, 0.0, 0.0), radius=0.13),
     (0.95, 0.85, 0.3)),
)

_LAYER_PRIMS = (
    # staircase of slabs (strong mutual occlusion from most viewpoints)
    (partial(_box_sdf, center=(-0.35, 0.0, -0.45), half=(0.22, 0.55, 0.07)),
     (0.85, 0.3, 0.3)),
    (partial(_box_sdf, center=(-0.05, 0.0, -0.22), half=(0.22, 0.5, 0.07)),
     (0.9, 0.65, 0.25)),
    (partial(_box_sdf, center=(0.25, 0.0, 0.01), half=(0.22, 0.45, 0.07)),
     (0.35, 0.8, 0.35)),
    (partial(_box_sdf, center=(0.5, 0.0, 0.24), half=(0.18, 0.4, 0.07)),
     (0.3, 0.55, 0.9)),
    (partial(_sphere_sdf, center=(-0.3, 0.3, 0.25), radius=0.18),
     (0.8, 0.35, 0.85)),
    (partial(_sphere_sdf, center=(0.0, -0.4, 0.35), radius=0.14),
     (0.3, 0.85, 0.85)),
    (partial(_cylinder_sdf, center=(-0.45, -0.3, -0.05), axis=2,
             radius=0.07, half_len=0.45), (0.95, 0.9, 0.5)),
)


def _soft_union_field(prims, x, sharpness=60.0, density_scale=45.0):
    """THE soft-union GT contract (one copy for every scene): density is
    a smooth indicator of the primitive union, color the softmin-
    weighted blend of primitive colors."""
    sdfs = jnp.stack([sdf(x) for sdf, _ in prims], axis=-1)
    colors = jnp.asarray([c for _, c in prims], dtype=jnp.float32)
    occ = jax.nn.sigmoid(-sharpness * sdfs)
    union = 1.0 - jnp.prod(1.0 - occ, axis=-1)
    sigma = density_scale * union
    wts = jax.nn.softmax(-sharpness * sdfs, axis=-1)
    # explicit fp32 blend (einsum would run at bf16 matmul precision)
    rgb = jnp.sum(wts[..., :, None] * colors, axis=-2)
    return rgb, sigma


def analytic_field_rings(x: jnp.ndarray):
    """Interlocked tori + core sphere: curved thin structure the
    box/sphere scenes lack (suite diversity, BASELINE config 4)."""
    return _soft_union_field(_RING_PRIMS, x, sharpness=80.0)


def analytic_field_layers(x: jnp.ndarray):
    """Staircase slabs + spheres + rod: occlusion-heavy layered scene
    (suite diversity, BASELINE config 4)."""
    return _soft_union_field(_LAYER_PRIMS, x)


FIELDS = {
    "prims": analytic_field,
    "hard": analytic_field_hard,
    "rings": analytic_field_rings,
    "layers": analytic_field_layers,
}


def scene_background(name: str) -> bool:
    """Intrinsic GT background of a procedural scene (True = white).
    The generated images are 3-channel (already composited), so a config
    whose white_background disagrees cannot be re-composited — callers
    must match this value (load_data validates)."""
    return name != "hard"


# --------------------------------------------------------------------------
# Ground-truth renderer (dense uniform marching, exact quadrature)
# --------------------------------------------------------------------------

def _look_at_pose(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """OpenGL/NeRF camera-to-world: camera looks down its -z at target."""
    z = eye - target
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = x, y, z, eye
    return pose


def sphere_poses(n: int, radius: float = 3.5, seed: int = 0,
                 elevation_range=(0.15, 1.1)) -> np.ndarray:
    """n camera poses on a sphere looking at the origin. [n, 4, 4]."""
    rng = np.random.default_rng(seed)
    azim = rng.uniform(0.0, 2.0 * np.pi, size=n)
    elev = rng.uniform(*elevation_range, size=n)
    poses = []
    for a, e in zip(azim, elev):
        eye = radius * np.array(
            [np.cos(a) * np.cos(e), np.sin(a) * np.cos(e), np.sin(e)], dtype=np.float32
        )
        poses.append(_look_at_pose(eye, np.zeros(3, np.float32), np.array([0, 0, 1.0], np.float32)))
    return np.stack(poses)


def orbit_poses(
    n: int, radius: float = 3.5, elevation: float = 0.5
) -> np.ndarray:
    """n camera poses on a circular orbit (fixed elevation, uniform
    azimuth) looking at the origin — novel-view / turntable frames for
    `tnerf.cli render --orbit` (a capability the reference lacks
    entirely: it never renders at all).  [n, 4, 4]."""
    poses = []
    for a in np.linspace(0.0, 2.0 * np.pi, n, endpoint=False):
        eye = radius * np.array(
            [np.cos(a) * np.cos(elevation),
             np.sin(a) * np.cos(elevation),
             np.sin(elevation)], dtype=np.float32
        )
        poses.append(_look_at_pose(
            eye, np.zeros(3, np.float32), np.array([0, 0, 1.0], np.float32)
        ))
    return np.stack(poses)


@partial(jax.jit, static_argnames=("width", "height", "n_samples", "white_background", "field_name"))
def _render_gt_image(
    pose: jnp.ndarray,
    width: int,
    height: int,
    focal_px: float,
    near: float,
    far: float,
    n_samples: int,
    white_background: bool,
    field_name: str = "prims",
) -> jnp.ndarray:
    """Row-chunked so full-size GT renders fit on-device: 800x800 x 768
    samples would otherwise materialize ~6 GB per [H,W,S,3] intermediate
    (the dress-rehearsal exports hit this; small test scenes are one
    chunk)."""
    rays = camera_rays(pose, width, height, focal_px)
    t = jnp.linspace(near, far, n_samples + 1, dtype=jnp.float32)
    t_mid = 0.5 * (t[:-1] + t[1:])

    def rows(origins, directions):  # [h, W, 3] x2 -> [h, W, 3]
        h = origins.shape[0]
        deltas = jnp.broadcast_to(t[1:] - t[:-1], (h, width, n_samples))
        pts = origins[..., None, :] + directions[..., None, :] * t_mid[..., :, None]
        rgb, sigma = FIELDS[field_name](pts.reshape(-1, 3))
        rgb = rgb.reshape(h, width, n_samples, 3)
        sigma = sigma.reshape(h, width, n_samples)
        res = composite(rgb, sigma, deltas,
                        t_mid=jnp.broadcast_to(t_mid, sigma.shape),
                        white_background=white_background)
        return res.rgb

    # cap the [rows, W, S, 3] working set at ~100 MB
    row_chunk = max(1, min(height, int(8_000_000 / (width * n_samples))))
    if row_chunk >= height:
        return rows(rays.origins, rays.directions)
    # lax.map (a scan) SEQUENCES the chunks — an unrolled python loop
    # inside this jit lets XLA schedule every chunk's buffers
    # concurrently (measured 20 GB of HBO temps at 800x800x768).
    n_chunks = -(-height // row_chunk)
    pad = n_chunks * row_chunk - height
    o = jnp.pad(rays.origins, ((0, pad), (0, 0), (0, 0)))
    d = jnp.pad(rays.directions, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
    reshape = lambda a: a.reshape(n_chunks, row_chunk, width, 3)
    out = jax.lax.map(lambda ab: rows(ab[0], ab[1]), (reshape(o), reshape(d)))
    return out.reshape(n_chunks * row_chunk, width, 3)[:height]


def generate_procedural_scene(
    name: str = "prims",
    width: int = 128,
    height: int = 128,
    n_train: int = 24,
    n_val: int = 4,
    n_test: int = 8,
    n_samples: int = 384,
    near: float = 2.0,
    far: float = 5.5,
    white_background: bool = True,
    radius: float = 3.5,
) -> Dict[str, ImageDataset]:
    """Generate a full {train, val, test} dataset from the analytic field.

    name selects the field: "prims" (easy: 4 soft primitives, white
    background) or "hard" (thin rods + high-frequency texture, black
    background — the quality-hardening gate).  The hard scene forces
    white_background=False and a denser GT quadrature (rods are ~1 fine
    cell wide; the GT march must not skip over them).
    """
    if name not in FIELDS:
        raise ValueError(f"unknown procedural scene {name!r}; have {sorted(FIELDS)}")
    if name == "hard":
        white_background = False
        # 772 (not a rounder 768): the shared TPU compile service keys
        # its cache on the exact program; a client killed mid-compile
        # leaves that key's pending entry permanently wedged, and every
        # later request for the same program join-waits on it forever.
        # Changing the sample count re-keys the GT-render program.
        n_samples = max(n_samples, 772)
    focal = focal_from_angle(width, CAMERA_ANGLE_X)
    out: Dict[str, ImageDataset] = {}
    counts = {"train": n_train, "val": n_val, "test": n_test}
    seeds = {"train": 10, "val": 20, "test": 30}
    for split, n in counts.items():
        if n == 0:
            continue
        poses = sphere_poses(n, radius=radius, seed=seeds[split])
        imgs = []
        for i in range(n):
            img = _render_gt_image(
                jnp.asarray(poses[i]), width, height, focal,
                near, far, n_samples, white_background, field_name=name,
            )
            imgs.append(np.asarray(jax.device_get(img), dtype=np.float32))
        out[split] = ImageDataset(
            images=np.clip(np.stack(imgs), 0.0, 1.0),
            poses=poses,
            focal=focal,
            width=width,
            height=height,
            channels=3,
            split=split,
        )
    return out


def frontal_poses(
    n: int,
    radius: float = 3.5,
    seed: int = 0,
    azimuth_half_width: float = 0.35,
    elevation_range=(0.25, 0.6),
) -> np.ndarray:
    """n forward-facing poses on a narrow frontal arc looking at the
    origin — the LLFF capture geometry (handheld views from one side).
    [n, 4, 4] camera-to-world in the NeRF/OpenGL convention."""
    rng = np.random.default_rng(seed)
    azim = rng.uniform(-azimuth_half_width, azimuth_half_width, size=n)
    elev = rng.uniform(*elevation_range, size=n)
    poses = []
    for a, e in zip(azim, elev):
        eye = radius * np.array(
            [np.cos(a) * np.cos(e), np.sin(a) * np.cos(e), np.sin(e)],
            dtype=np.float32,
        )
        poses.append(
            _look_at_pose(eye, np.zeros(3, np.float32), np.array([0, 0, 1.0], np.float32))
        )
    return np.stack(poses)


def generate_llff_pool(
    name: str = "prims",
    width: int = 320,
    height: int = 240,
    n_views: int = 24,
    n_samples: int = 384,
    near: float = 2.0,
    far: float = 5.5,
    radius: float = 3.5,
    seed: int = 40,
) -> ImageDataset:
    """One pool of forward-facing views of a procedural field (the LLFF
    capture shape: a single image set, test views held out by index).
    Non-square by default — LLFF photos are landscape, and W != H
    exercises the focal/aspect paths the square synthetic flow never
    touches."""
    if name not in FIELDS:
        raise ValueError(f"unknown procedural scene {name!r}; have {sorted(FIELDS)}")
    white_background = scene_background(name)
    focal = focal_from_angle(width, CAMERA_ANGLE_X)
    poses = frontal_poses(n_views, radius=radius, seed=seed)
    imgs = []
    for i in range(n_views):
        img = _render_gt_image(
            jnp.asarray(poses[i]), width, height, focal,
            near, far, n_samples, white_background, field_name=name,
        )
        imgs.append(np.asarray(jax.device_get(img), dtype=np.float32))
    return ImageDataset(
        images=np.clip(np.stack(imgs), 0.0, 1.0),
        poses=poses,
        focal=focal,
        width=width,
        height=height,
        channels=3,
        split="all",
    )


def export_llff_format(
    ds: ImageDataset, scene_dir: str, near: float, far: float
) -> None:
    """Write an image pool to disk in LLFF layout (poses_bounds.npy +
    images/) so tnerf.data.llff can round-trip it.

    poses_bounds.npy rows are the flattened [3, 5] LLFF matrix
    (rotation | translation | [H, W, focal]) + [near, far]; LLFF camera
    axes are [down, right, backwards], the exact inverse of the column
    conversion in llff.load_llff_scene — so reader+writer pin each other.
    (The reference's LLFF branch is dead code, loader/data_loader.cpp:
    140-148 defect D15; this is the real capability.)"""
    from tnerf.data.png_io import write_png_batch

    img_dir = os.path.join(scene_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    n = len(ds)
    write_png_batch(
        [os.path.join(img_dir, f"image{i:03d}.png") for i in range(n)],
        ds.images,
    )
    pb = np.zeros((n, 17), np.float64)
    for i in range(n):
        c2w = ds.poses[i]
        raw = np.zeros((3, 5), np.float64)
        raw[:, 0] = -c2w[:3, 1]  # down  = -up
        raw[:, 1] = c2w[:3, 0]   # right
        raw[:, 2] = c2w[:3, 2]   # backwards
        raw[:, 3] = c2w[:3, 3]   # translation
        raw[:, 4] = (ds.height, ds.width, ds.focal)
        pb[i, :15] = raw.reshape(-1)
        pb[i, 15:] = (near, far)
    np.save(os.path.join(scene_dir, "poses_bounds.npy"), pb)


def export_colmap_format(
    ds: ImageDataset,
    scene_dir: str,
    n_points: int = 512,
    seed: int = 7,
    field_name: str = "prims",
    sigma_threshold: float = 1.0,
) -> None:
    """Write an image pool to disk as a COLMAP sparse reconstruction
    (sparse/0/{cameras,images,points3D}.txt + images/) so
    tnerf.data.colmap can round-trip it.

    Poses are converted NeRF c2w -> COLMAP world-to-camera (y-down,
    z-forward — the exact inverse of load_colmap_scene's conversion, so
    reader and writer pin each other).  points3D is a real sparse cloud:
    positions sampled where the procedural field is dense, so the
    reader's per-image depth bounds (1/99 percentiles of observed point
    depths) reflect actual scene content the way a genuine COLMAP
    reconstruction's would.  The reference's loader never had a COLMAP
    path at all (loader/data_loader.cpp:98-149 reads only the synthetic
    transforms_*.json layout); this is the real-capture capability."""
    from tnerf.data.colmap import rotmat_to_qvec
    from tnerf.data.png_io import write_png_batch

    sparse = os.path.join(scene_dir, "sparse", "0")
    img_dir = os.path.join(scene_dir, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    n = len(ds)
    names = [f"frame_{i:03d}.png" for i in range(n)]
    write_png_batch([os.path.join(img_dir, nm) for nm in names], ds.images)

    # -- sparse points from the field's dense region
    lin = np.linspace(-1.1, 1.1, 48, dtype=np.float32)
    X = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    _, sigma = FIELDS[field_name](jnp.asarray(X))
    occ = X[np.asarray(sigma) > sigma_threshold]
    if occ.shape[0] == 0:
        raise ValueError(
            f"procedural field {field_name!r} has no density above "
            f"{sigma_threshold} on the probe grid"
        )
    rng = np.random.default_rng(seed)
    sel = rng.choice(occ.shape[0], min(n_points, occ.shape[0]), replace=False)
    pts = occ[sel] + rng.normal(0.0, 0.005, (sel.size, 3)).astype(np.float32)

    cx, cy = ds.width / 2.0, ds.height / 2.0
    with open(os.path.join(sparse, "cameras.txt"), "w") as fh:
        fh.write("# Camera list: CAMERA_ID MODEL W H fx fy cx cy\n")
        fh.write(
            f"1 PINHOLE {ds.width} {ds.height} "
            f"{ds.focal:.17g} {ds.focal:.17g} {cx:.17g} {cy:.17g}\n"
        )
    with open(os.path.join(sparse, "images.txt"), "w") as fh:
        fh.write("# IMAGE_ID qw qx qy qz tx ty tz CAMERA_ID NAME\n")
        for i in range(n):
            c = np.array(ds.poses[i], np.float64)
            c[:3, 1] *= -1.0  # NeRF (y up, z back) -> COLMAP (y down, z fwd)
            c[:3, 2] *= -1.0
            R = c[:3, :3].T
            t = -R @ c[:3, 3]
            q = rotmat_to_qvec(R)
            fh.write(
                f"{i + 1} " + " ".join(f"{v:.17g}" for v in q) + " "
                + " ".join(f"{v:.17g}" for v in t) + f" 1 {names[i]}\n"
            )
            # every view observes every point (the reader uses only the
            # ids, for depth bounds); 2-D coordinates are placeholders
            fh.write(
                " ".join(f"0.0 0.0 {pid + 1}" for pid in range(len(pts)))
                + "\n"
            )
    with open(os.path.join(sparse, "points3D.txt"), "w") as fh:
        fh.write("# POINT3D_ID x y z r g b error TRACK\n")
        for pid, xyz in enumerate(pts):
            fh.write(
                f"{pid + 1} " + " ".join(f"{v:.17g}" for v in xyz)
                + " 128 128 128 0.5 1 0\n"
            )


def export_nerf_synthetic_format(datasets: Dict[str, ImageDataset], scene_dir: str) -> None:
    """Write a procedural scene to disk in NeRF-synthetic layout so the
    loader (tnerf.data.dataset) can round-trip it."""
    from tnerf.data.png_io import write_png_batch

    os.makedirs(scene_dir, exist_ok=True)
    for split, ds in datasets.items():
        os.makedirs(os.path.join(scene_dir, split), exist_ok=True)
        write_png_batch(
            [os.path.join(scene_dir, f"{split}/r_{i}.png")
             for i in range(len(ds))],
            ds.images,
        )
        frames = []
        for i in range(len(ds)):
            frames.append({
                "file_path": f"./{split}/r_{i}",
                "transform_matrix": ds.poses[i].tolist(),
            })
        meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
        with open(os.path.join(scene_dir, f"transforms_{split}.json"), "w") as fh:
            json.dump(meta, fh)
