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


def ssim(pred: np.ndarray, gt: np.ndarray, window: int = 11, sigma: float = 1.5) -> float:
    """Structural similarity (standard 11x11 gaussian window, L=1).

    Pure numpy; matches the conventional NeRF-paper SSIM settings
    (k1=0.01, k2=0.03) to within windowing edge effects.
    """
    a = np.asarray(pred, np.float64)
    b = np.asarray(gt, np.float64)
    r = window // 2
    x = np.arange(window) - r
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()

    def blur(img):  # separable gaussian over H, W for each channel
        out = np.apply_along_axis(lambda v: np.convolve(v, g, mode="same"), 0, img)
        return np.apply_along_axis(lambda v: np.convolve(v, g, mode="same"), 1, out)

    mu_a, mu_b = blur(a), blur(b)
    sa = blur(a * a) - mu_a ** 2
    sb = blur(b * b) - mu_b ** 2
    sab = blur(a * b) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (sa + sb + c2)
    )
    return float(s[r:-r, r:-r].mean())


def render_dataset_view(
    renderer: RendererFn,
    params: dict,
    dataset: ImageDataset,
    index: int,
    scene_scale: float,
    chunk_size: int = 65536,
    occupancy=None,
    mesh=None,
) -> np.ndarray:
    rays = camera_rays(
        jax.numpy.asarray(dataset.poses[index]),
        dataset.width,
        dataset.height,
        dataset.focal,
        scene_scale,
    )
    res = render_image(
        renderer, params, rays, chunk_size=chunk_size,
        occupancy=occupancy, mesh=mesh,
    )
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
    occupancy=None,
    mesh=None,
) -> Dict[str, float]:
    """Mean PSNR over (up to max_views of) a split; optionally save PNGs."""
    gt = dataset.composited(white_background)
    n = len(dataset) if max_views is None else min(max_views, len(dataset))
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    psnrs, ssims, frames = [], [], []
    for i in range(n):
        pred = render_dataset_view(
            renderer, params, dataset, i, scene_scale, chunk_size,
            occupancy=occupancy, mesh=mesh,
        )
        psnrs.append(psnr(pred, gt[i]))
        ssims.append(ssim(pred, gt[i]))
        if save_dir:
            frames.append(pred)
    if save_dir and frames:
        from tnerf.data.png_io import write_png_batch

        write_png_batch(
            [os.path.join(save_dir, f"{dataset.split}_{i:03d}.png")
             for i in range(n)],
            np.stack(frames),
        )
    return {
        f"psnr_{dataset.split}": float(np.mean(psnrs)),
        f"psnr_{dataset.split}_min": float(np.min(psnrs)),
        f"ssim_{dataset.split}": float(np.mean(ssims)),
        f"n_views_{dataset.split}": float(n),
    }
