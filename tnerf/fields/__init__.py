"""Radiance fields: input encodings + MLPs (TPU-native replacement for the
reference's tiny-cuda-nn dependency — see SURVEY §2.2)."""

from tnerf.fields.encodings import frequency_encoding  # noqa: F401
from tnerf.fields.nerf_field import NeRFField  # noqa: F401
