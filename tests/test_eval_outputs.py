"""Depth / opacity render outputs at the eval + CLI surface.

The reference intended render output (stb_image_write.h included at
main.cu:19-21, never called) but computed no auxiliary channels; every
NeRF framework users would migrate from exposes depth + alpha maps, so
the rebuild surfaces the compositor's acc (sum of weights) and expected
termination depth (composite.py) as images: eval.depth_image /
eval.acc_image and `cli render --channels rgb,depth,acc`.
"""

import numpy as np
import pytest

from tnerf.eval import acc_image, depth_image


def test_depth_image_convention():
    """Near = bright, far = dark, background (low acc) = black; the
    unnormalized expectation sum(w*t) is divided by acc before mapping
    so translucent pixels don't read as artificially near."""
    depth = np.array([[2.0, 4.0, 0.0],
                      [1.0, 2.0, 0.05]], np.float32)
    acc = np.array([[1.0, 1.0, 0.01],
                    [0.5, 0.5, 0.01]], np.float32)
    img = depth_image(depth, acc)
    assert img.shape == (2, 3, 3)
    assert img.dtype == np.float32
    # background pixels (acc <= threshold) are exactly black
    np.testing.assert_array_equal(img[0, 2], 0.0)
    np.testing.assert_array_equal(img[1, 2], 0.0)
    # normalized depths: [2, 4, -, 2, 4, -] -> t in {2, 4}; auto range
    # [2, 4]; near (t=2) -> 1.0, far (t=4) -> 0.0
    assert img[0, 0, 0] == pytest.approx(1.0)
    assert img[0, 1, 0] == pytest.approx(0.0)
    # acc=0.5 pixels normalize to the same t as their opaque twins
    np.testing.assert_allclose(img[1, 0], img[0, 0])
    np.testing.assert_allclose(img[1, 1], img[0, 1])
    # explicit near/far override the auto exposure
    img2 = depth_image(depth, acc, near=0.0, far=4.0)
    assert img2[0, 0, 0] == pytest.approx(0.5)
    assert img2[0, 1, 0] == pytest.approx(0.0)


def test_depth_image_all_background():
    img = depth_image(np.zeros((4, 4), np.float32),
                      np.zeros((4, 4), np.float32))
    np.testing.assert_array_equal(img, 0.0)


def test_acc_image_clips_and_broadcasts():
    acc = np.array([[0.25, 1.5], [-0.1, 1.0]], np.float32)
    img = acc_image(acc)
    assert img.shape == (2, 2, 3)
    np.testing.assert_allclose(img[..., 0], [[0.25, 1.0], [0.0, 1.0]])
    np.testing.assert_array_equal(img[..., 0], img[..., 1])


def test_cli_render_channels(tmp_path):
    """End-to-end: tiny CLI train, then `render --channels rgb,depth,acc`
    writes all three PNGs; an unknown channel is rejected."""
    from tnerf.cli import main
    from tnerf.data.png_io import read_png

    out_dir = tmp_path / "run"
    base = [
        "--override", "scene.kind=procedural",
        "--override", "scene.name=prims",
        "--override", "scene.scene_scale=1.0",
        "--override", "scene.proc_width=24",
        "--override", "scene.proc_height=24",
        "--override", "scene.proc_n_train=2",
        "--override", "scene.proc_n_val=1",
        "--override", "scene.proc_n_test=1",
        "--override", "render.pipeline=grid_march",
        "--override", "sampler.samples_per_ray=16",
        "--override", "sampler.near=2.0", "--override", "sampler.far=5.5",
        "--override", "field_.hidden_width=16",
        "--override", "field_.hidden_layers=1",
        "--override", "field_.n_frequencies=2",
        "--override", "grid.resolution=8",
        "--override", "grid.warmup_steps=5",
        "--override", "grid.update_every=5",
        "--override", "train.batch_size=64",
        "--override", "train.eval_every=0",
        "--override", "train.checkpoint_every=0",
        "--override", "render.chunk_size=576",
        "--override", f"logging.out_dir={out_dir}",
    ]
    assert main(["train", "--override", "train.steps=12", *base]) == 0

    png = tmp_path / "view.png"
    rc = main([
        "render", "--pose-index", "0",
        "--channels", "rgb,depth,acc", "--out", str(png), *base,
    ])
    assert rc == 0
    for p in (png, tmp_path / "view_depth.png", tmp_path / "view_acc.png"):
        img = read_png(str(p), channels=3)
        assert img.shape == (24, 24, 3)
        assert np.all(np.isfinite(img))

    assert main([
        "render", "--channels", "rgb,normals",
        "--out", str(tmp_path / "x.png"), *base,
    ]) == 1

    # eval --save-renders writes one PNG per evaluated view
    rdir = tmp_path / "renders"
    assert main(["eval", "--save-renders", str(rdir), *base]) == 0
    assert (rdir / "val_000.png").exists()
    assert (rdir / "test_000.png").exists()

    # orbit --gif assembles the turntable frames into an animated GIF;
    # --channels applies to orbit frames too (regression: it used to be
    # silently ignored on the orbit path)
    odir = tmp_path / "orbit"
    assert main([
        "render", "--orbit", "3", "--gif", "--channels", "rgb,depth",
        "--out", str(odir), *base,
    ]) == 0
    from PIL import Image

    with Image.open(odir / "orbit.gif") as gif:
        assert getattr(gif, "n_frames", 1) == 3
    assert (odir / "orbit_002.png").exists()
    assert (odir / "orbit_002_depth.png").exists()

    # an invalid channel list fails fast on the orbit path as well
    assert main([
        "render", "--orbit", "2", "--channels", "bogus",
        "--out", str(tmp_path / "o2"), *base,
    ]) == 1
    assert not (tmp_path / "o2" / "orbit_000.png").exists()

    # custom camera path from a JSON pose list
    import json

    from tnerf.data.procedural import sphere_poses

    poses = sphere_poses(2, radius=3.5)
    pfile = tmp_path / "poses.json"
    with open(pfile, "w") as fh:
        json.dump({"poses": [np.asarray(p).tolist() for p in poses]}, fh)
    pdir = tmp_path / "pathout"
    assert main([
        "render", "--path", str(pfile), "--out", str(pdir), *base,
    ]) == 0
    assert (pdir / "path_000.png").exists()
    assert (pdir / "path_001.png").exists()
    # --orbit and --path are mutually exclusive
    assert main([
        "render", "--orbit", "2", "--path", str(pfile),
        "--out", str(tmp_path / "x"), *base,
    ]) == 1
    # malformed poses rejected with a diagnostic
    badf = tmp_path / "bad.json"
    badf.write_text("[[[1,2],[3,4]]]")
    assert main([
        "render", "--path", str(badf), "--out", str(tmp_path / "y"), *base,
    ]) == 1


def test_cli_suite_end_to_end(tmp_path, capsys):
    """`tnerf suite` (BASELINE config 4 shape): evaluates each scene's
    checkpoint from <out_dir>/<scene>/checkpoints against the test
    split, honors proc_* scene knobs (regression: it regenerated GT at
    library defaults), skips scenes without checkpoints, and prints the
    summary JSON with mean PSNR."""
    import json

    from tnerf.cli import main

    out_base = tmp_path / "suite"
    base = [
        "--override", "scene.kind=procedural",
        "--override", "scene.scene_scale=1.0",
        "--override", "scene.proc_width=24",
        "--override", "scene.proc_height=24",
        "--override", "scene.proc_n_train=2",
        "--override", "scene.proc_n_val=0",
        "--override", "scene.proc_n_test=1",
        "--override", "render.pipeline=grid_march",
        "--override", "sampler.samples_per_ray=8",
        "--override", "sampler.near=2.0", "--override", "sampler.far=5.5",
        "--override", "field_.hidden_width=16",
        "--override", "field_.hidden_layers=1",
        "--override", "field_.n_frequencies=2",
        "--override", "grid.resolution=8",
        "--override", "grid.warmup_steps=4",
        "--override", "grid.update_every=4",
        "--override", "train.batch_size=64",
        "--override", "train.steps=8",
        "--override", "train.eval_every=0",
        "--override", "train.checkpoint_every=0",
        "--override", "train.log_every=4",
        "--override", "render.chunk_size=576",
    ]
    # train the 'prims' scene into the suite layout
    assert main([
        "train", "--override", "scene.name=prims",
        "--override", f"logging.out_dir={out_base / 'prims'}", *base,
    ]) == 0
    rc = main([
        "suite", "--scenes", "prims,missing_scene",
        "--override", f"logging.out_dir={out_base}", *base,
    ])
    captured = capsys.readouterr()
    assert rc == 0
    # stdout also carries the train command's metrics JSON — the suite
    # summary is the final blob
    summary = json.loads(captured.out[captured.out.rfind('{\n  "scenes"'):])
    assert "prims" in summary["scenes"]
    assert "missing_scene" not in summary["scenes"]
    assert np.isfinite(summary["mean_psnr_test"])
    # proc_* knobs honored: the evaluated GT is the 24x24 export, so the
    # suite render dir holds 24x24 images
    from tnerf.data.png_io import read_png

    import glob as _glob

    renders = sorted(_glob.glob(str(out_base / "prims" / "suite_renders" / "*.png")))
    assert renders
    assert read_png(renders[0], channels=3).shape == (24, 24, 3)
