"""Camera / ray-generation unit tests (SURVEY §4: rays vs analytically
known poses; focal math fixing defect D8)."""

import math

import jax.numpy as jnp
import numpy as np

from tnerf.cameras import (
    camera_rays,
    focal_from_angle,
    pixel_rays,
    thetaphi_to_unit,
    viewdirs_to_thetaphi,
)


def test_focal_from_angle_matches_nerf_convention():
    # lego: camera_angle_x = 0.6911112, W=800 -> focal ~ 1111.111
    f = focal_from_angle(800, 0.6911112070083618)
    assert abs(f - 1111.1110311937682) < 1e-6


def test_identity_pose_center_ray_points_down_minus_z():
    pose = jnp.eye(4)
    rays = camera_rays(pose, 4, 4, focal_px=2.0)
    # center of image: average of the 4 middle pixels is exactly -z
    d = np.asarray(rays.directions)
    center = d[1:3, 1:3].mean(axis=(0, 1))
    center /= np.linalg.norm(center)
    np.testing.assert_allclose(center, [0, 0, -1], atol=1e-6)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)


def test_rays_respect_pose_rotation_and_translation():
    # camera at (1,2,3) rotated 90 deg about z: x_cam -> y_world
    c, s = 0.0, 1.0
    pose = jnp.array(
        [[c, -s, 0, 1.0], [s, c, 0, 2.0], [0, 0, 1, 3.0], [0, 0, 0, 1.0]]
    )
    rays = camera_rays(pose, 3, 3, focal_px=100.0, scene_scale=0.5)
    np.testing.assert_allclose(np.asarray(rays.origins)[0, 0], [0.5, 1.0, 1.5], atol=1e-6)
    # central pixel direction ~ -z world (rotation is about z)
    d = np.asarray(rays.directions)[1, 1]
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-2)


def test_pixel_rays_matches_camera_rays():
    rng = np.random.default_rng(0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.3, -0.2, 1.5]
    w, h, f = 8, 6, 7.0
    full = camera_rays(jnp.asarray(pose), w, h, f, scene_scale=0.7)
    xs = rng.integers(0, w, 10)
    ys = rng.integers(0, h, 10)
    pix = jnp.stack([jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32)], -1)
    poses = jnp.broadcast_to(jnp.asarray(pose), (10, 4, 4))
    batch = pixel_rays(poses, pix, w, h, f, scene_scale=0.7)
    np.testing.assert_allclose(
        np.asarray(batch.directions), np.asarray(full.directions)[ys, xs], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(batch.origins), np.asarray(full.origins)[ys, xs], atol=1e-6
    )


def test_thetaphi_roundtrip_and_reference_convention():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tp = viewdirs_to_thetaphi(jnp.asarray(d, jnp.float32))
    back = thetaphi_to_unit(tp)
    np.testing.assert_allclose(np.asarray(back), d, atol=1e-5)
    # reference convention check (optixPrograms.cu:71-73): +z -> theta=0
    tp_z = viewdirs_to_thetaphi(jnp.asarray([[0.0, 0.0, 1.0]]))
    assert abs(float(tp_z[0, 0])) < 1e-6
    # +x -> theta=pi/2, phi=0
    tp_x = viewdirs_to_thetaphi(jnp.asarray([[1.0, 0.0, 0.0]]))
    assert abs(float(tp_x[0, 0]) - math.pi / 2) < 1e-6
    assert abs(float(tp_x[0, 1])) < 1e-6


def test_orbit_poses_geometry():
    """Orbit cameras sit at the requested radius/elevation, look at the
    origin (-z column points from eye to origin), uniform azimuth."""
    import numpy as np

    from tnerf.data.procedural import orbit_poses

    n, r, e = 8, 3.5, 0.4
    poses = orbit_poses(n, radius=r, elevation=e)
    assert poses.shape == (n, 4, 4)
    eyes = poses[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(eyes, axis=1), r, rtol=1e-5)
    np.testing.assert_allclose(eyes[:, 2], r * np.sin(e), rtol=1e-5)
    # camera -z axis points at the origin
    z = poses[:, :3, 2]
    np.testing.assert_allclose(z, eyes / np.linalg.norm(eyes, axis=1, keepdims=True), atol=1e-5)
    # uniform azimuth: consecutive angular gaps equal
    az = np.arctan2(eyes[:, 1], eyes[:, 0])
    gaps = np.diff(np.unwrap(az))
    np.testing.assert_allclose(gaps, 2 * np.pi / n, rtol=1e-4)
    # rotations are orthonormal
    R = poses[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.broadcast_to(np.eye(3), (n, 3, 3)), atol=1e-5
    )


def test_scalar_focal_equals_expanded_intrinsics():
    """The scalar-focal camera is bit-identical to the 4-tuple
    (f, f, W/2, H/2) form — the intrinsics generalization must not
    perturb the reference camera model by even an ulp."""
    import jax.numpy as jnp

    from tnerf.cameras import camera_rays, pixel_rays

    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.2, -0.1, 2.5]
    W, H, f = 9, 7, 11.0
    a = camera_rays(jnp.asarray(pose), W, H, f)
    b = camera_rays(jnp.asarray(pose), W, H, (f, f, W / 2, H / 2))
    np.testing.assert_array_equal(np.asarray(a.directions),
                                  np.asarray(b.directions))
    pix = jnp.asarray([[0.0, 0.0], [4.0, 3.0], [8.0, 6.0]], np.float32)
    poses = jnp.asarray(np.stack([pose] * 3))
    pa = pixel_rays(poses, pix, W, H, f)
    pb = pixel_rays(poses, pix, W, H, (f, f, W / 2, H / 2))
    np.testing.assert_array_equal(np.asarray(pa.directions),
                                  np.asarray(pb.directions))


def test_full_intrinsics_principal_point_and_anisotropy():
    """With (fx, fy, cx, cy): the pixel whose center sits at (cx, cy)
    looks straight down -z, and fy scales vertical offsets independently
    of fx."""
    import jax.numpy as jnp

    from tnerf.cameras import camera_rays, resolve_intrinsics

    W, H = 8, 8
    fx, fy, cx, cy = 10.0, 20.0, 3.5, 5.5  # pixel (3,5) center on-axis
    rays = camera_rays(jnp.asarray(np.eye(4, dtype=np.float32)), W, H,
                       (fx, fy, cx, cy))
    d = np.asarray(rays.directions)  # [H, W, 3]
    np.testing.assert_allclose(d[5, 3], [0.0, 0.0, -1.0], atol=1e-7)
    # one pixel right of axis: x offset 1/fx; one pixel down: y = +1/fy
    # (image rows grow downward; camera +y is up)
    dr = d[5, 4] / -d[5, 4][2]
    np.testing.assert_allclose(dr[0], 1.0 / fx, rtol=1e-5)
    dd = d[6, 3] / -d[6, 3][2]
    np.testing.assert_allclose(dd[1], -1.0 / fy, rtol=1e-5)
    # scalar expansion helper
    assert resolve_intrinsics(10, 6, 4.0) == (4.0, 4.0, 5.0, 3.0)
