"""Evaluation: PSNR over held-out splits + render-to-PNG.

The reference has no eval at all — its only metric is a printed per-batch
training loss (main.cu:760-761) and its loader never reads the val/test
splits (defect D13).  This module renders held-out views and reports PSNR
(the BASELINE.json acceptance metric: >=30 dB test PSNR; parity within
0.5 dB of a correct CUDA-style render).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from tnerf.cameras import camera_rays
from tnerf.data.dataset import ImageDataset
from tnerf.render.renderer import RendererFn, render_image
from tnerf.train import psnr


def render_dataset_view(
    renderer: RendererFn,
    params: dict,
    dataset: ImageDataset,
    index: int,
    scene_scale: float,
    chunk_size: int = 65536,
) -> np.ndarray:
    rays = camera_rays(
        jax.numpy.asarray(dataset.poses[index]),
        dataset.width,
        dataset.height,
        dataset.focal,
        scene_scale,
    )
    res = render_image(renderer, params, rays, chunk_size=chunk_size)
    return np.asarray(jax.device_get(res.rgb))


def evaluate(
    renderer: RendererFn,
    params: dict,
    dataset: ImageDataset,
    scene_scale: float,
    white_background: bool = True,
    max_views: Optional[int] = None,
    save_dir: Optional[str] = None,
    chunk_size: int = 65536,
) -> Dict[str, float]:
    """Mean PSNR over (up to max_views of) a split; optionally save PNGs."""
    gt = dataset.composited(white_background)
    n = len(dataset) if max_views is None else min(max_views, len(dataset))
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    psnrs = []
    for i in range(n):
        pred = render_dataset_view(renderer, params, dataset, i, scene_scale, chunk_size)
        psnrs.append(psnr(pred, gt[i]))
        if save_dir:
            from tnerf.data.png_io import write_png

            write_png(os.path.join(save_dir, f"{dataset.split}_{i:03d}.png"), pred)
    return {
        f"psnr_{dataset.split}": float(np.mean(psnrs)),
        f"psnr_{dataset.split}_min": float(np.min(psnrs)),
        f"n_views_{dataset.split}": float(n),
    }
