"""LLFF end-to-end rehearsal: exercise the forward-facing path for real.

The reference's LLFF branch is dead code (loader/data_loader.cpp:140-148,
defect D15) and the environment has no LLFF captures, so tnerf's LLFF
reader had only unit tests.  This tool closes the gap hermetically:

1. renders a forward-facing pool of procedural GT views (landscape
   480x360 — W != H exercises the focal/aspect paths the square
   synthetic flow never touches),
2. exports it to LLFF layout (poses_bounds.npy + images/) via
   export_llff_format — the exact inverse of the reader's axis
   conversion, so reader and writer pin each other,
3. loads it back through the REAL LLFF reader (holdout split protocol),
4. trains the standard grid_march pipeline on the loaded-from-disk data
   end-to-end on TPU and evaluates PSNR on the holdout views.

Usage:   python tools/llff_rehearsal.py [--steps 2500] [--skip-export]
Outputs: data/llff/prims_ff/ on disk, runs/llff_rehearsal/ metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_ROOT = os.path.join(REPO, "data", "llff")
OUT_ROOT = os.path.join(REPO, "runs", "llff_rehearsal")

SCENE = "prims_ff"
W, H = 480, 360
N_VIEWS = 26  # holdout_every=8 -> 4 test views (0, 8, 16, 24)
NEAR, FAR = 2.0, 5.5


def export_scene():
    from tnerf.data.procedural import export_llff_format, generate_llff_pool

    scene_dir = os.path.join(DATA_ROOT, SCENE)
    if os.path.exists(os.path.join(scene_dir, "poses_bounds.npy")):
        print(f"[export] {SCENE}: already on disk, skipping")
        return
    t0 = time.perf_counter()
    pool = generate_llff_pool(
        "prims", width=W, height=H, n_views=N_VIEWS, near=NEAR, far=FAR
    )
    export_llff_format(pool, scene_dir, near=NEAR, far=FAR)
    print(f"[export] {SCENE}: {N_VIEWS} views {W}x{H} in "
          f"{time.perf_counter() - t0:.1f}s -> {scene_dir}")


def load_scene() -> dict:
    from tnerf.data.dataset import load_data

    t0 = time.perf_counter()
    ds = load_data("llff", SCENE, root=DATA_ROOT)
    dt = time.perf_counter() - t0
    info = {
        split: {"views": len(d), "shape": [d.height, d.width, d.channels],
                "focal": float(d.focal)}
        for split, d in ds.items()
    }
    info["seconds"] = round(dt, 3)
    print(f"[loader] {SCENE}: {info}")
    return info


def train_scene(steps: int) -> dict:
    from tnerf.config import Config
    from tnerf.train_loop import run_training

    cfg = Config().apply_overrides([
        "scene.kind=llff", f"scene.name={SCENE}", f"scene.root={DATA_ROOT}",
        # prims is a white-background field; LLFF images keep it baked in
        "scene.white_background=true", "render.white_background=true",
        "scene.scene_scale=1.0",
        f"sampler.near={NEAR}", f"sampler.far={FAR}",
        # default flagship is the fused pipeline; the LLFF rehearsal
        # drives the march path (the renderer every preset family uses)
        "render.pipeline=grid_march",
        "render.compact=false", "render.ray_compact=false",
        f"train.steps={steps}",
        f"train.eval_every={steps}", f"train.checkpoint_every={steps}",
        f"logging.out_dir={OUT_ROOT}",
    ])
    print(f"[train] {SCENE}: {steps} steps, pipeline={cfg.render.pipeline}")
    metrics = run_training(cfg)
    print(f"[train] {SCENE}: {metrics}")
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    if not args.skip_export:
        export_scene()
    results = {"loader": load_scene()}
    if not args.skip_train:
        results["train"] = train_scene(args.steps)
    os.makedirs(OUT_ROOT, exist_ok=True)
    with open(os.path.join(OUT_ROOT, "summary.json"), "w") as fh:
        json.dump(results, fh, indent=2, default=float)
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
