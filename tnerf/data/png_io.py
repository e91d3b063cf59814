"""PNG read/write with explicit color-space semantics.

Replaces the reference's vendored stb_image/stb_image_write
(loader/stb_image.h, used at loader/data_loader.cpp:63-65 via
`stbi_loadf(..., 3 channels)`).  Note `stbi_loadf` applies a gamma-2.2
decode by default; the NeRF convention is a plain /255.  We expose both
and default to /255 (SURVEY §2.2).

Decoding prefers the native C++ decoder (tnerf.native.png) when the
shared library has been built; otherwise falls back to PIL.
"""

from __future__ import annotations

import numpy as np


def read_png(
    path: str,
    channels: int = 4,
    srgb_to_linear: bool = False,
) -> np.ndarray:
    """Read a PNG into float32 [H, W, channels] in [0, 1].

    channels: 3 (RGB) or 4 (RGBA). NeRF-synthetic images are RGBA; the
    reference drops alpha (3-channel load) — we keep it so the white/black
    background composite is explicit downstream.
    """
    arr = None
    try:
        from tnerf.native import png as native_png

        arr = native_png.decode(path)  # [H, W, 4] uint8 or None
    except Exception:
        arr = None
    if arr is None:
        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("RGBA")
            arr = np.asarray(im, dtype=np.uint8)
    out = arr.astype(np.float32) / 255.0
    if srgb_to_linear:
        rgb = out[..., :3]
        out = out.copy()
        out[..., :3] = np.where(
            rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4
        )
    if channels == 3:
        return out[..., :3]
    if channels == 4:
        return out
    raise ValueError(f"channels must be 3 or 4, got {channels}")


def write_png(path: str, image: np.ndarray) -> None:
    """Write float [H, W, 3|4] in [0,1] (or uint8) to a PNG.

    The reference includes stb_image_write.h (main.cu:19-21) but never
    calls it — the intended render-output capability, implemented here.
    Prefers the native C++ encoder (tnerf.native.png) and falls back to
    PIL, mirroring read_png.
    """
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    try:
        from tnerf.native import png as native_png

        if native_png.encode(path, arr):
            return
    except Exception:
        pass
    from PIL import Image

    Image.fromarray(arr).save(path)


def write_png_batch(paths, images) -> None:
    """Write same-sized frames ([N, H, W, 3|4] float in [0,1] or uint8)
    in parallel through the native threaded encoder; falls back to a
    write_png loop.  The production export path for eval renders and
    dataset dress-rehearsal exports (deflate-bound, parallel across
    files)."""
    arr = np.asarray(images)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    try:
        from tnerf.native import png as native_png

        if native_png.encode_batch(list(paths), arr):
            return
    except Exception:
        pass
    for p, im in zip(paths, arr):
        write_png(p, im)
