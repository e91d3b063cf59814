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


def render_dataset_view_result(
    renderer: RendererFn,
    params: dict,
    dataset: ImageDataset,
    index: int,
    scene_scale: float,
    chunk_size: int = 65536,
    occupancy=None,
    mesh=None,
    pose_delta=None,
    ndc_near=None,
):
    """Full RenderResult (rgb + acc + expected depth) for one dataset
    pose, device_get'd to host numpy.

    pose_delta: optional [6] se3 delta composed onto the pose before
    ray generation — rendering a TRAIN view of a pose-refined
    checkpoint with its learned correction (cli render --refined-poses).
    ndc_near: scene.ndc near plane (None = off) — warps rays into NDC
    so eval sees the same ray space training used.
    """
    pose = jax.numpy.asarray(dataset.poses[index])
    if pose_delta is not None:
        from tnerf.cameras import compose_pose, se3_exp

        pose = compose_pose(se3_exp(jax.numpy.asarray(pose_delta)), pose)
    rays = camera_rays(
        pose,
        dataset.width,
        dataset.height,
        dataset.camera,
        scene_scale,
    )
    if ndc_near is not None:
        from tnerf.cameras import ndc_warp

        rays = ndc_warp(
            rays, dataset.width, dataset.height, dataset.camera, ndc_near
        )
    res = render_image(
        renderer, params, rays, chunk_size=chunk_size,
        occupancy=occupancy, mesh=mesh,
    )
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), res)


def render_dataset_view(
    renderer: RendererFn,
    params: dict,
    dataset: ImageDataset,
    index: int,
    scene_scale: float,
    chunk_size: int = 65536,
    occupancy=None,
    mesh=None,
    ndc_near=None,
) -> np.ndarray:
    return render_dataset_view_result(
        renderer, params, dataset, index, scene_scale,
        chunk_size=chunk_size, occupancy=occupancy, mesh=mesh,
        ndc_near=ndc_near,
    ).rgb


def hit_depths(
    depth: np.ndarray, acc: np.ndarray, acc_threshold: float = 0.1
) -> tuple:
    """(hit_mask, E[t | hit]) per pixel — the opacity normalization and
    hit test shared by depth_image and the CLI's global orbit/path
    exposure pass (one definition, so the exposure range is always
    computed over exactly the pixels depth_image maps)."""
    depth = np.asarray(depth, np.float32)
    acc = np.asarray(acc, np.float32)
    hit = acc > acc_threshold
    return hit, np.where(hit, depth / np.maximum(acc, 1e-6), 0.0)


def depth_image(
    depth: np.ndarray,
    acc: np.ndarray,
    near: Optional[float] = None,
    far: Optional[float] = None,
    acc_threshold: float = 0.1,
) -> np.ndarray:
    """Visualize expected-termination depth as an inverted-grayscale
    [H, W, 3] float image in [0, 1] (near = bright, background = black —
    the usual NeRF depth-map convention).

    The compositor's `depth` is sum(w * t) — an UNNORMALIZED expectation
    that shrinks toward 0 on translucent pixels — so pixels with
    acc > acc_threshold are normalized by their opacity (E[t | hit]) and
    the rest are treated as background.  With no explicit [near, far],
    the range is the opaque pixels' min/max (full-contrast auto
    exposure)."""
    hit, t_hit = hit_depths(depth, acc, acc_threshold)
    if near is None:
        near = float(t_hit[hit].min()) if hit.any() else 0.0
    if far is None:
        far = float(t_hit[hit].max()) if hit.any() else 1.0
    x = (t_hit - near) / max(far - near, 1e-6)
    g = np.where(hit, 1.0 - np.clip(x, 0.0, 1.0), 0.0).astype(np.float32)
    return np.repeat(g[..., None], 3, axis=-1)


def acc_image(acc: np.ndarray) -> np.ndarray:
    """Accumulated-opacity (alpha) map as [H, W, 3] float in [0, 1]."""
    g = np.clip(np.asarray(acc, np.float32), 0.0, 1.0)
    return np.repeat(g[..., None], 3, axis=-1)


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
    ndc_near=None,
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
            occupancy=occupancy, mesh=mesh, ndc_near=ndc_near,
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
