"""Build libtnerf_native.so (run: python -m tnerf.native.build)."""

from __future__ import annotations

import os
import subprocess
import sys

SRC = ["src/png_decoder.cpp", "src/png_encoder.cpp"]
OUT = "libtnerf_native.so"


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, OUT)
    cmd = (
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread"]
        + [os.path.join(here, s) for s in SRC]
        + ["-lz", "-o", out]
    )
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(path))))
    from tnerf.native import png

    print("built:", path, "loadable:", png.available())
