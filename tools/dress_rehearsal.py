"""Full-size loader dress rehearsal (VERDICT round-3 item 5).

The environment has no NeRF-synthetic data and no network egress, so the
lego-shaped configs had never executed end-to-end at real scale.  This
tool retires that risk without real data:

1. renders procedural GT scenes at the full 800x800 lego resolution,
2. exports them to NeRF-synthetic format on disk (PNG + transforms json),
3. loads them back through the REAL reader + native threaded PNG decoder
   (reference loader/data_loader.cpp:34-94 semantics), timing the load,
4. trains the lego-shaped config (configs/lego_train_30db.json shape) on
   the loaded-from-disk data end-to-end on TPU,
5. runs `tnerf.cli suite` over both exported scenes.

Usage:  python tools/dress_rehearsal.py [--steps 2000] [--skip-export]
Outputs: data/nerf_synthetic/{prims800,hard800}/ on disk,
         runs/dress_rehearsal/<scene>/ metrics + checkpoints,
         runs/dress_rehearsal/loader_bench.json (loader throughput).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_ROOT = os.path.join(REPO, "data", "nerf_synthetic")
OUT_ROOT = os.path.join(REPO, "runs", "dress_rehearsal")

SCENES = {
    # name -> (procedural field, n_train, n_val, n_test, white_bg)
    "prims800": ("prims", 24, 2, 4),
    "hard800": ("hard", 16, 2, 4),
}


def export_scenes():
    from tnerf.data.procedural import (
        export_nerf_synthetic_format, generate_procedural_scene,
    )

    for out_name, (field_name, n_tr, n_va, n_te) in SCENES.items():
        scene_dir = os.path.join(DATA_ROOT, out_name)
        if os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
            print(f"[export] {out_name}: already on disk, skipping")
            continue
        t0 = time.perf_counter()
        ds = generate_procedural_scene(
            field_name, width=800, height=800,
            n_train=n_tr, n_val=n_va, n_test=n_te,
        )
        export_nerf_synthetic_format(ds, scene_dir)
        print(f"[export] {out_name}: {n_tr + n_va + n_te} views 800x800 "
              f"in {time.perf_counter() - t0:.1f}s -> {scene_dir}")


def bench_loader() -> dict:
    """Time load_data through the real reader + native PNG decoder."""
    from tnerf.data.dataset import load_data

    out = {}
    for out_name in SCENES:
        t0 = time.perf_counter()
        ds = load_data("nerf_synthetic", out_name, root=DATA_ROOT)
        dt = time.perf_counter() - t0
        n_img = sum(len(d) for d in ds.values())
        n_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(os.path.join(DATA_ROOT, out_name))
            for f in fs if f.endswith(".png")
        )
        tr = ds["train"]
        out[out_name] = {
            "images": n_img,
            "seconds": round(dt, 3),
            "images_per_sec": round(n_img / dt, 1),
            "png_MB": round(n_bytes / 1e6, 1),
            "decode_MB_per_sec": round(n_bytes / 1e6 / dt, 1),
            "shape": [tr.height, tr.width, tr.channels],
        }
        print(f"[loader] {out_name}: {out[out_name]}")
    os.makedirs(OUT_ROOT, exist_ok=True)
    with open(os.path.join(OUT_ROOT, "loader_bench.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    return out


def train_scene(scene: str, steps: int):
    """lego_train_30db-shaped training on the exported full-size scene,
    loaded from disk through the real reader."""
    from tnerf.config import Config
    from tnerf.data.procedural import scene_background
    from tnerf.train_loop import run_training

    white = scene_background("prims" if scene.startswith("prims") else "hard")
    cfg = Config.from_json_file(os.path.join(REPO, "configs", "lego_train_30db.json"))
    cfg = cfg.apply_overrides([
        "scene.kind=nerf_synthetic", f"scene.name={scene}",
        f"scene.root={DATA_ROOT}",
        f"scene.white_background={'true' if white else 'false'}",
        f"render.white_background={'true' if white else 'false'}",
        # hard-gate geometry: procedural cameras sit at radius 3.5 in
        # grid units (scene_scale 1), not lego's blender radius-4 world
        "scene.scene_scale=1.0",
        "sampler.near=2.0", "sampler.far=5.5",
        # The rehearsal validates the LOADER + full-size training, not
        # tuned compaction capacities: the procedural scenes' EMA'd
        # occupancy is much fatter than the gate scenes', and overflowing
        # ray/sample capacities would cut renders (capacities are
        # per-scene measurements — see configs/README.md).  Render dense.
        "render.compact=false", "render.ray_compact=false",
        f"train.steps={steps}",
        f"train.eval_every={steps}", f"train.checkpoint_every={steps}",
        f"logging.out_dir={os.path.join(OUT_ROOT, scene)}",
    ])
    print(f"[train] {scene}: {steps} steps, pipeline={cfg.render.pipeline}")
    metrics = run_training(cfg)
    print(f"[train] {scene}: {metrics}")
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--scenes", default="prims800,hard800")
    args = ap.parse_args()

    if not args.skip_export:
        export_scenes()
    loader = bench_loader()
    results = {"loader": loader}
    if not args.skip_train:
        for scene in args.scenes.split(","):
            results[scene] = train_scene(scene.strip(), args.steps)
    with open(os.path.join(OUT_ROOT, "summary.json"), "w") as fh:
        json.dump(results, fh, indent=2, default=float)
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
