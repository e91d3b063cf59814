"""Golden-file integration test (SURVEY §4): a fixed-seed render checked
into the repo, compared with tolerance — guards against silent regressions
in camera math, quadrature, or the analytic scene across refactors."""

import os

import numpy as np

import jax.numpy as jnp

from tnerf.cameras import focal_from_angle
from tnerf.data.procedural import CAMERA_ANGLE_X, _render_gt_image, sphere_poses

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "procedural_view_32.npy")


def test_render_matches_golden():
    golden = np.load(GOLDEN)
    pose = sphere_poses(1, radius=3.5, seed=42)[0]
    img = np.asarray(
        _render_gt_image(
            jnp.asarray(pose), 32, 32, focal_from_angle(32, CAMERA_ANGLE_X),
            2.0, 5.5, 256, True,
        )
    )
    assert img.shape == golden.shape
    # tolerance covers cross-platform (CPU/TPU) float differences but
    # catches any real convention/quadrature change
    err = np.abs(img - golden)
    assert err.max() < 5e-2, f"max err {err.max():.4f}"
    assert err.mean() < 2e-3, f"mean err {err.mean():.5f}"
