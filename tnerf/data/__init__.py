"""Dataset loading (TPU-native replacement for reference loader/).

The reference loads NeRF-synthetic scenes with jsoncpp + stb_image in C++
(loader/data_loader.cpp) — train split only (defect D13), with a
copy-pasted wrong path for `materials` (D12) and a dead LLFF branch (D15).
This package loads all three splits for all eight scenes, plus:

- `png_io`: PNG decode/encode. Decoding prefers the native C++ loader
  (tnerf/native) when built, falling back to PIL.
- `procedural`: an analytic volume scene + ground-truth renderer used to
  generate datasets when no NeRF-synthetic data is on disk (hermetic
  testing/benchmarking).
"""

from tnerf.data.dataset import ImageDataset, load_data  # noqa: F401
