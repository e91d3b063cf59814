"""Differentiable volume rendering (TPU-native replacement for reference
vol_render/)."""

from tnerf.render.composite import (  # noqa: F401
    RenderResult,
    composite,
    render_weights,
)
