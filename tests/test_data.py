"""Dataset tests: procedural generation, NeRF-synthetic format round-trip
(reference loader semantics, fixing D12/D13), config system."""

import numpy as np
import pytest

from tnerf.config import Config
from tnerf.data.dataset import SYNTHETIC_SCENES, load_data, load_images_json
from tnerf.data.procedural import (
    export_nerf_synthetic_format,
    generate_procedural_scene,
)


@pytest.fixture(scope="module")
def tiny_scene():
    return generate_procedural_scene(
        width=24, height=24, n_train=3, n_val=1, n_test=2, n_samples=96
    )


def test_procedural_scene_shapes_and_splits(tiny_scene):
    assert set(tiny_scene) == {"train", "val", "test"}  # all 3 splits (D13 fix)
    tr = tiny_scene["train"]
    assert tr.images.shape == (3, 24, 24, 3)
    assert tr.poses.shape == (3, 4, 4)
    assert 0.0 <= tr.images.min() and tr.images.max() <= 1.0
    # white background: corners of the image should be near-white
    assert tr.images[:, 0, 0].min() > 0.95


def test_procedural_scene_has_content(tiny_scene):
    tr = tiny_scene["train"]
    # the object must actually appear (not all white)
    assert tr.images.min() < 0.6
    # different views differ
    assert np.abs(tr.images[0] - tr.images[1]).max() > 0.05


def test_export_and_reload_roundtrip(tiny_scene, tmp_path):
    scene_dir = tmp_path / "prims"
    export_nerf_synthetic_format(tiny_scene, str(scene_dir))
    assert (scene_dir / "transforms_train.json").exists()
    assert (scene_dir / "transforms_val.json").exists()
    assert (scene_dir / "transforms_test.json").exists()
    # reload via the NeRF-synthetic reader (renamed to a real scene name)
    import shutil

    dst = tmp_path / "lego"
    shutil.move(str(scene_dir), str(dst))
    loaded = load_data("nerf_synthetic", "lego", root=str(tmp_path))
    tr, orig = loaded["train"], tiny_scene["train"]
    assert tr.channels == 4  # loader keeps alpha channel
    np.testing.assert_allclose(tr.poses, orig.poses, atol=1e-6)
    assert abs(tr.focal - orig.focal) < 1e-4
    # PNG quantization: within 1/255
    np.testing.assert_allclose(
        tr.composited(white_background=True), orig.images, atol=1.5 / 255
    )


def test_all_scene_names_routed():
    assert len(SYNTHETIC_SCENES) == 8
    assert "materials" in SYNTHETIC_SCENES  # D12 regression


def test_config_roundtrip_and_overrides():
    from tnerf.config import reference_parity_config

    cfg = Config()
    assert cfg.train.seed == 1337            # reference main.cu:344
    assert cfg.sampler.samples_per_interval == 32  # sampler.h:4
    # The reference's hardcoded values live in reference_parity_config
    # (Config() defaults are the measured TPU flagship since round 3).
    ref = reference_parity_config()
    assert ref.grid.resolution == 8          # main.cu:394
    assert ref.grid.effective_max_hits == 24  # main.cu:486
    assert ref.render.pipeline == "grid_march"
    assert ref.field_.hash_log2_table_size == 19  # tcnn schema main.cu:35-69
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2 == cfg
    cfg3 = cfg.apply_overrides(
        ["train.lr=0.01", "grid.resolution=128", "scene.name=ship", "field_.encoding=hashgrid"]
    )
    assert cfg3.train.lr == 0.01
    assert cfg3.grid.resolution == 128
    assert cfg3.grid.effective_max_hits == 384
    assert cfg3.scene.name == "ship"
    with pytest.raises(KeyError):
        cfg.apply_overrides(["train.nonexistent=1"])


def test_hard_procedural_scene_properties():
    """The quality-hardening scene: thin rods (~1 fine cell), darker
    non-white background, high-frequency texture (VERDICT r1 item 7)."""
    import jax.numpy as jnp

    from tnerf.data.procedural import analytic_field_hard, generate_procedural_scene

    ds = generate_procedural_scene("hard", width=48, height=48,
                                   n_train=1, n_val=0, n_test=1, n_samples=768)
    img = ds["train"].images[0]
    # black background: border pixels dark
    assert img[0, :, :].max() < 0.05 and img[-1, :, :].max() < 0.05
    assert img.max() > 0.4  # content present

    # a thin rod registers density at its center but not 3 radii away
    center = (0.45, -0.35, -0.05)  # first rod, axis z, r=0.015
    _, sig_on = analytic_field_hard(jnp.asarray([center], jnp.float32))
    _, sig_off = analytic_field_hard(jnp.asarray([[0.45 + 0.06, -0.35, -0.05]], jnp.float32))
    assert float(sig_on[0]) > 50.0
    assert float(sig_off[0]) < 1.0

    # high-frequency texture: neighboring GT samples differ substantially
    x = jnp.stack([jnp.linspace(-0.5, 0.5, 64), jnp.zeros(64), jnp.full((64,), 0.05)], axis=-1)
    rgb, _ = analytic_field_hard(x)
    diffs = jnp.abs(jnp.diff(rgb[:, 0]))
    assert float(diffs.max()) > 0.05


def test_suite_scene_variants_generate_content():
    """The rings/layers suite scenes (BASELINE config 4 diversity): white
    background, real content, and geometry distinct from prims (a torus
    ring registers density on the ring but not at the torus hole)."""
    import jax.numpy as jnp
    import pytest

    from tnerf.data.procedural import (
        FIELDS,
        analytic_field_rings,
        generate_procedural_scene,
    )

    assert set(FIELDS) >= {"prims", "hard", "rings", "layers"}
    for name in ("rings", "layers"):
        ds = generate_procedural_scene(name, width=32, height=32,
                                       n_train=1, n_val=0, n_test=1,
                                       n_samples=128)
        img = ds["train"].images[0]
        assert img[0, :, :].min() > 0.9  # white background border
        assert img.min() < 0.6           # content present
    # outer torus: R=0.45 r=0.09 about z — on-ring dense, hole empty
    _, s_on = analytic_field_rings(jnp.asarray([[0.45, 0.0, 0.0]], jnp.float32))
    _, s_far = analytic_field_rings(jnp.asarray([[0.65, 0.65, 0.65]], jnp.float32))
    assert float(s_on[0]) > 20.0
    assert float(s_far[0]) < 1.0


def test_unknown_procedural_scene_errors():
    import pytest

    from tnerf.data.procedural import generate_procedural_scene

    with pytest.raises(ValueError, match="unknown procedural scene"):
        generate_procedural_scene("nope", n_train=1)


def test_ngp_style_transforms_load(tiny_scene, tmp_path):
    """instant-ngp-style transforms (fl_x/fl_y/cx/cy instead of
    camera_angle_x) load through the same reader: centered isotropic
    intrinsics degenerate to the scalar-focal camera; off-center or
    anisotropic ones surface as dataset.intrinsics and flow into ray
    generation via dataset.camera."""
    import json
    import shutil

    from tnerf.cameras import camera_rays

    scene_dir = tmp_path / "ngp"
    export_nerf_synthetic_format(tiny_scene, str(scene_dir))
    orig = tiny_scene["train"]
    w = h = orig.width

    def rewrite(extra):
        for split in ("train", "val", "test"):
            p = scene_dir / f"transforms_{split}.json"
            meta = json.loads(p.read_text())
            meta.pop("camera_angle_x", None)
            meta.update(extra)
            p.write_text(json.dumps(meta))

    # centered isotropic ngp intrinsics == the scalar camera
    rewrite({"fl_x": float(orig.focal)})
    ds = load_images_json(str(scene_dir), "train")
    assert ds.intrinsics is None
    assert abs(ds.focal - orig.focal) < 1e-6
    assert np.isscalar(ds.camera) or isinstance(ds.camera, float)

    # off-center anisotropic intrinsics surface as the 4-tuple
    # half-integer principal point => a pixel CENTER sits exactly on-axis
    intr = {"fl_x": 40.0, "fl_y": 44.0, "cx": w / 2 + 1.5, "cy": h / 2 - 2.5}
    rewrite(intr)
    ds2 = load_images_json(str(scene_dir), "train")
    assert ds2.intrinsics == (40.0, 44.0, intr["cx"], intr["cy"])
    assert ds2.focal == 40.0
    # rays generated from dataset.camera use the principal point: the
    # on-axis direction sits at (cx, cy), not the image center
    rays = camera_rays(np.eye(4, dtype=np.float32), ds2.width, ds2.height,
                       ds2.camera)
    d = np.asarray(rays.directions)
    iy, ix = int(intr["cy"] - 0.5), int(intr["cx"] - 0.5)
    np.testing.assert_allclose(d[iy, ix], [0, 0, -1.0], atol=1e-7)

    # a transforms file with neither key fails fast
    for split in ("train",):
        p = scene_dir / f"transforms_{split}.json"
        meta = json.loads(p.read_text())
        for k in ("fl_x", "fl_y", "cx", "cy"):
            meta.pop(k, None)
        p.write_text(json.dumps(meta))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="camera_angle_x"):
        load_images_json(str(scene_dir), "train")


def test_ngp_intrinsics_downscale(tiny_scene, tmp_path):
    """Intrinsics are stated at the original resolution; a downscaled
    load divides fx/fy/cx/cy with the image dimensions."""
    import json

    scene_dir = tmp_path / "ngp2"
    export_nerf_synthetic_format(tiny_scene, str(scene_dir))
    orig = tiny_scene["train"]
    w = h = orig.width
    p = scene_dir / "transforms_train.json"
    meta = json.loads(p.read_text())
    meta.pop("camera_angle_x")
    meta.update({"fl_x": 40.0, "fl_y": 44.0, "cx": w / 2 + 2.0, "cy": h / 2})
    p.write_text(json.dumps(meta))
    ds = load_images_json(str(scene_dir), "train", downscale=2)
    assert ds.width == w // 2
    assert ds.intrinsics == (20.0, 22.0, w / 4 + 1.0, h / 4)


def test_jpeg_frames_load_through_reader(tiny_scene, tmp_path):
    """transforms frames with explicit .jpg extensions (common in
    instant-ngp datasets) load through the reader: the native PNG
    decoder declines them and the PIL fallback decodes — pinned so the
    fallback chain can't silently regress to an error or garbage."""
    import json
    import os

    from PIL import Image

    from tnerf.data.dataset import load_images_json
    from tnerf.data.procedural import export_nerf_synthetic_format

    sdir = tmp_path / "jpgscene"
    export_nerf_synthetic_format(tiny_scene, str(sdir))
    meta = json.loads((sdir / "transforms_train.json").read_text())
    for fr in meta["frames"]:
        p = os.path.join(sdir, fr["file_path"])
        if not os.path.splitext(p)[1]:
            p += ".png"
        img = Image.open(p).convert("RGBA")
        bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
        j = os.path.splitext(p)[0] + ".jpg"
        Image.alpha_composite(bg, img).convert("RGB").save(j, quality=95)
        fr["file_path"] = os.path.relpath(j, sdir)
    (sdir / "transforms_train.json").write_text(json.dumps(meta))
    ds = load_images_json(str(sdir), "train")
    assert ds.images.shape[:1] == (len(meta["frames"]),)
    got = ds.composited(white_background=True)
    ref = tiny_scene["train"].images
    # jpg is lossy; the mean error bounds decode correctness, not codec
    # quality (max single-pixel error can be large at sharp edges)
    assert float(np.abs(got - ref).mean()) < 0.05
