"""LLFF reader tests on a synthetic poses_bounds.npy fixture (round-trip
through the LLFF axis convention)."""

import numpy as np
import pytest
from PIL import Image

from tnerf.data import load_data


def _make_llff_scene(tmp_path, n=9, w=32, h=24, focal=40.0):
    rng = np.random.default_rng(0)
    scene = tmp_path / "fern"
    img_dir = scene / "images"
    img_dir.mkdir(parents=True)
    c2ws = []
    pb = np.zeros((n, 17), np.float64)
    for i in range(n):
        # random c2w in NeRF convention [right, up, back]
        a = rng.normal(size=3)
        z = a / np.linalg.norm(a)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = x, y, z
        c2w[:3, 3] = rng.normal(size=3)
        c2ws.append(c2w)
        # store in LLFF convention [down, right, back]: col0=-y, col1=x
        m = np.zeros((3, 5))
        m[:, 0] = -c2w[:3, 1]
        m[:, 1] = c2w[:3, 0]
        m[:, 2] = c2w[:3, 2]
        m[:, 3] = c2w[:3, 3]
        m[:, 4] = [h, w, focal]
        pb[i, :15] = m.reshape(-1)
        pb[i, 15:] = [1.0, 10.0]
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img, "RGB").save(img_dir / f"im_{i:03d}.png")
    np.save(scene / "poses_bounds.npy", pb)
    return np.stack(c2ws)


def test_llff_loads_and_converts_axes(tmp_path):
    c2ws = _make_llff_scene(tmp_path)
    out = load_data("llff", "fern", root=str(tmp_path))
    assert set(out) == {"train", "test"}
    n_total = len(out["train"]) + len(out["test"])
    assert n_total == 9
    assert len(out["test"]) == 2  # every 8th of 9
    # poses converted back to NeRF convention
    test_idx = [0, 8]
    np.testing.assert_allclose(out["test"].poses, c2ws[test_idx], atol=1e-6)
    train_idx = [i for i in range(9) if i not in test_idx]
    np.testing.assert_allclose(out["train"].poses, c2ws[train_idx], atol=1e-6)
    assert abs(out["train"].focal - 40.0) < 1e-4
    assert out["train"].near_far.shape == (7, 2)
    np.testing.assert_allclose(out["train"].near_far[0], [1.0, 10.0])


def test_llff_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_data("llff", "nonexistent", root=str(tmp_path))


def test_export_llff_roundtrip(tmp_path):
    """export_llff_format -> load_data('llff') round-trips poses (exact
    axis-conversion inverse), focal, non-square dims, and images (to PNG
    u8 quantization)."""
    from tnerf.data.dataset import ImageDataset
    from tnerf.data.procedural import export_llff_format, frontal_poses

    rng = np.random.default_rng(3)
    n, w, h = 9, 20, 12
    poses = frontal_poses(n, seed=5)
    images = rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32)
    ds = ImageDataset(
        images=images, poses=poses.astype(np.float32), focal=33.5,
        width=w, height=h, channels=3, split="all",
    )
    export_llff_format(ds, str(tmp_path / "ff"), near=1.5, far=6.0)

    out = load_data("llff", "ff", root=str(tmp_path))
    assert set(out) == {"train", "test"}
    # standard holdout: every 8th view is test
    test_idx = [i for i in range(n) if i % 8 == 0]
    train_idx = [i for i in range(n) if i % 8 != 0]
    for split, idx in (("train", train_idx), ("test", test_idx)):
        d = out[split]
        assert (d.width, d.height) == (w, h)
        np.testing.assert_allclose(d.focal, 33.5, rtol=1e-6)
        np.testing.assert_allclose(d.poses, poses[idx], atol=1e-6)
        # reader loads RGBA; RGB channels round-trip to u8 quantization
        np.testing.assert_allclose(
            d.images[..., :3], images[idx], atol=1.0 / 255.0 + 1e-6
        )
        np.testing.assert_allclose(d.near_far, [[1.5, 6.0]] * len(idx))


def test_auto_near_far_from_llff_bounds(tmp_path):
    """sampler.near/far = -1 derives the t-range from the LLFF depth
    bounds (0.9*min, 1.1*max, scene_scale units); scenes without bounds
    reject the auto setting."""
    import pytest

    from tnerf.config import Config
    from tnerf.data.dataset import ImageDataset
    from tnerf.data.procedural import export_llff_format, frontal_poses
    from tnerf.train_loop import resolve_near_far

    rng = np.random.default_rng(7)
    n, w, h = 4, 16, 12
    ds = ImageDataset(
        images=rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32),
        poses=frontal_poses(n, seed=1).astype(np.float32), focal=20.0,
        width=w, height=h, channels=3, split="all",
    )
    export_llff_format(ds, str(tmp_path / "ff"), near=2.0, far=5.0)
    out = load_data("llff", "ff", root=str(tmp_path))

    cfg = Config().apply_overrides([
        "sampler.near=-1", "sampler.far=-1", "scene.scene_scale=0.5",
    ])
    r = resolve_near_far(cfg, out["train"])
    np.testing.assert_allclose(r.sampler.near, 0.9 * 2.0 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(r.sampler.far, 1.1 * 5.0 * 0.5, rtol=1e-6)
    # one-sided auto keeps the explicit side
    r2 = resolve_near_far(
        cfg.apply_overrides(["sampler.near=0.3"]), out["train"]
    )
    assert r2.sampler.near == 0.3
    np.testing.assert_allclose(r2.sampler.far, 1.1 * 5.0 * 0.5, rtol=1e-6)
    # both explicit: no-op (returns cfg unchanged)
    explicit = Config().apply_overrides(["sampler.near=1.0", "sampler.far=2.0"])
    assert resolve_near_far(explicit, out["train"]) is explicit
    # scene without bounds rejects auto
    no_bounds = ImageDataset(
        images=ds.images, poses=ds.poses, focal=20.0,
        width=w, height=h, channels=3,
    )
    with pytest.raises(ValueError, match="depth bounds"):
        resolve_near_far(cfg, no_bounds)


def test_llff_training_with_auto_near_far(tmp_path):
    """End-to-end: train on an LLFF export with sampler.near/far=-1 —
    the resolved range flows into every renderer (train + eval)."""
    from tnerf.config import Config
    from tnerf.data.dataset import ImageDataset
    from tnerf.data.procedural import export_llff_format, frontal_poses
    from tnerf.train_loop import run_training

    rng = np.random.default_rng(11)
    n, w, h = 5, 16, 12
    ds = ImageDataset(
        images=rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32),
        poses=frontal_poses(n, seed=2).astype(np.float32), focal=20.0,
        width=w, height=h, channels=3, split="all",
    )
    export_llff_format(ds, str(tmp_path / "ff"), near=1.0, far=4.0)
    cfg = Config().apply_overrides([
        "scene.kind=llff", "scene.name=ff", f"scene.root={tmp_path}",
        "scene.scene_scale=1.0", "scene.white_background=false",
        "render.white_background=false",
        "render.pipeline=grid_march",
        "sampler.samples_per_ray=8", "sampler.near=-1", "sampler.far=-1",
        "field_.hidden_width=16", "field_.hidden_layers=1",
        "field_.n_frequencies=2",
        "grid.resolution=8", "grid.warmup_steps=4", "grid.update_every=4",
        "train.batch_size=64", "train.steps=8", "train.eval_every=0",
        "train.checkpoint_every=0", "train.log_every=4",
        f"logging.out_dir={tmp_path / 'run'}", "render.chunk_size=576",
    ])
    m = run_training(cfg)
    assert np.isfinite(m["psnr_test"])
