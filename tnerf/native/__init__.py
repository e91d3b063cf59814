"""Native (C++) runtime components.

The reference's runtime layer is entirely native (C++/CUDA); this package
holds the TPU framework's native equivalents, loaded via ctypes:

- `png`: libdeflate-free PNG decoder (replaces vendored stb_image.h) —
  built from tnerf/native/src/png_decoder.cpp into libtnerf_native.so.

Every native component has a pure-Python fallback; importing this package
never fails if the shared library is absent.
"""
