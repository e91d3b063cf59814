"""Native C++ PNG decoder vs PIL (ground truth) across PNG variants."""

import os

import numpy as np
import pytest
from PIL import Image

from tnerf.native import png as native_png


def _require_native():
    if not native_png.available():
        pytest.skip("libtnerf_native.so not built (python -m tnerf.native.build)")


def _roundtrip(tmp_path, arr, mode, name):
    img = Image.fromarray(arr, mode)
    path = str(tmp_path / f"{name}.png")
    img.save(path)
    got = native_png.decode(path)
    assert got is not None, f"native decode failed for {mode}"
    want = np.asarray(Image.open(path).convert("RGBA"))
    np.testing.assert_array_equal(got, want)


def test_rgba(tmp_path):
    _require_native()
    rng = np.random.default_rng(0)
    _roundtrip(tmp_path, rng.integers(0, 256, (37, 53, 4), dtype=np.uint8), "RGBA", "rgba")


def test_rgb(tmp_path):
    _require_native()
    rng = np.random.default_rng(1)
    _roundtrip(tmp_path, rng.integers(0, 256, (64, 64, 3), dtype=np.uint8), "RGB", "rgb")


def test_grey(tmp_path):
    _require_native()
    rng = np.random.default_rng(2)
    _roundtrip(tmp_path, rng.integers(0, 256, (16, 128), dtype=np.uint8), "L", "grey")


def test_grey_alpha(tmp_path):
    _require_native()
    rng = np.random.default_rng(3)
    _roundtrip(tmp_path, rng.integers(0, 256, (20, 20, 2), dtype=np.uint8), "LA", "la")


def test_palette(tmp_path):
    _require_native()
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    img = Image.fromarray(arr, "RGB").quantize(colors=64)
    path = str(tmp_path / "pal.png")
    img.save(path)
    got = native_png.decode(path)
    assert got is not None
    want = np.asarray(Image.open(path).convert("RGBA"))
    np.testing.assert_array_equal(got, want)


def test_smooth_gradient_exercises_filters(tmp_path):
    """Smooth gradients make PIL's encoder pick sub/up/avg/paeth filters."""
    _require_native()
    y, x = np.mgrid[0:128, 0:128]
    arr = np.stack(
        [x * 2 % 256, y * 2 % 256, (x + y) % 256, np.full_like(x, 255)], -1
    ).astype(np.uint8)
    _roundtrip(tmp_path, arr, "RGBA", "grad")


def test_batch_decode_matches_single(tmp_path):
    _require_native()
    rng = np.random.default_rng(5)
    paths = []
    arrs = []
    for i in range(8):
        arr = rng.integers(0, 256, (24, 24, 4), dtype=np.uint8)
        p = str(tmp_path / f"b{i}.png")
        Image.fromarray(arr, "RGBA").save(p)
        paths.append(p)
        arrs.append(arr)
    got = native_png.decode_batch(paths, num_threads=4)
    assert got is not None and got.shape == (8, 24, 24, 4)
    for i in range(8):
        np.testing.assert_array_equal(got[i], native_png.decode(paths[i]))


def test_corrupt_file_returns_none(tmp_path):
    _require_native()
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as fh:
        fh.write(b"not a png at all")
    assert native_png.decode(p) is None


def test_loader_uses_native_path(tmp_path):
    """read_png must produce identical floats through the native decoder
    and the PIL fallback."""
    _require_native()
    from tnerf.data.png_io import read_png

    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, (30, 40, 4), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr, "RGBA").save(p)
    out = read_png(p, channels=4)
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0)


# ---- native encoder (the stb_image_write role, main.cu:19-21) ----

def test_encode_roundtrip_rgb_and_rgba(tmp_path):
    _require_native()
    rng = np.random.default_rng(7)
    for c, name in ((3, "enc_rgb"), (4, "enc_rgba")):
        arr = rng.integers(0, 256, (41, 29, c), dtype=np.uint8)
        arr[:10] = np.linspace(0, 255, 29, dtype=np.uint8)[None, :, None]
        path = str(tmp_path / f"{name}.png")
        assert native_png.encode(path, arr)
        want = arr if c == 4 else np.concatenate(
            [arr, np.full((41, 29, 1), 255, np.uint8)], axis=-1
        )
        # PIL is the independent oracle; the native decoder cross-checks
        np.testing.assert_array_equal(
            np.asarray(Image.open(path).convert("RGBA")), want
        )
        np.testing.assert_array_equal(native_png.decode(path), want)


def test_encode_batch_threaded(tmp_path):
    _require_native()
    rng = np.random.default_rng(8)
    imgs = rng.integers(0, 256, (9, 32, 48, 4), dtype=np.uint8)
    paths = [str(tmp_path / f"b{i}.png") for i in range(9)]
    assert native_png.encode_batch(paths, imgs, num_threads=3)
    got = native_png.decode_batch(paths)
    np.testing.assert_array_equal(got, imgs)


def test_write_png_prefers_native_and_roundtrips(tmp_path):
    _require_native()
    from tnerf.data.png_io import read_png, write_png

    img = np.linspace(0, 1, 24 * 24 * 3, dtype=np.float32).reshape(24, 24, 3)
    path = str(tmp_path / "f.png")
    write_png(path, img)
    back = read_png(path, channels=3)
    # float -> u8 quantization is the only loss
    assert np.abs(back - img).max() <= 0.5 / 255 + 1e-6


def test_write_png_batch_falls_back_without_native(tmp_path, monkeypatch):
    """When the native encoder declines (stale lib / bad input), the
    batch writer must still produce every file via the PIL loop."""
    import tnerf.data.png_io as png_io
    from tnerf.native import png as npng

    monkeypatch.setattr(npng, "encode_batch", lambda *a, **k: False)
    imgs = np.linspace(0, 1, 2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    paths = [str(tmp_path / f"fb{i}.png") for i in range(2)]
    png_io.write_png_batch(paths, imgs)
    for p, im in zip(paths, imgs):
        back = png_io.read_png(p, channels=3)
        assert np.abs(back - im).max() <= 0.5 / 255 + 1e-6
