"""Minimal library-level usage: procedural scene -> train -> render.

Everything here is the public API documented in docs/API.md; the CLI
(`python -m tnerf.cli`) wraps the same calls.  Runs hermetically (the
procedural scene needs no dataset on disk) on CPU or TPU:

    python examples/train_and_render.py [out_dir] [steps]
"""

import sys

import numpy as np

from tnerf.config import Config
from tnerf.data import load_data
from tnerf.data.png_io import write_png
from tnerf.eval import depth_image, render_dataset_view_result
from tnerf.train_loop import run_training

out_dir = sys.argv[1] if len(sys.argv) > 1 else "./runs/example"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500

# 1. configure: start from defaults, override like the CLI's -o flags
cfg = Config().apply_overrides([
    "scene.kind=procedural", "scene.name=prims", "scene.scene_scale=1.0",
    "scene.proc_width=64", "scene.proc_height=64",
    "render.pipeline=grid_march",
    "sampler.samples_per_ray=32", "sampler.near=2.0", "sampler.far=5.5",
    "grid.resolution=32", f"grid.warmup_steps={max(steps // 10, 1)}",
    "grid.update_every=10",
    f"train.batch_size=1024", f"train.steps={steps}",
    f"train.eval_every={max(steps // 2, 1)}",
    "train.keep_best=true",
    f"logging.out_dir={out_dir}",
])

# 2. train (loads the scene itself; pass datasets=... to override).
# Writes checkpoints/, checkpoints_best/, metrics.jsonl, config.json
# and final renders under out_dir.
metrics = run_training(cfg)
print("final metrics:", {k: round(v, 3) for k, v in metrics.items()})

# 3. render one held-out view + its depth map from the trained field
scene = load_data("procedural", cfg.scene.name,
                  proc={"width": 64, "height": 64})
from tnerf.grid.occupancy import renderer_payload
from tnerf.train import create_optimizer, init_train_state
from tnerf.train_loop import build_field, build_renderer
from tnerf.utils.checkpoint import restore_checkpoint

field = build_field(cfg)
state = init_train_state(field, create_optimizer(cfg.train), cfg.train.seed)
from tnerf.grid.occupancy import init_occupancy

step, (state, occ) = restore_checkpoint(
    f"{out_dir}/checkpoints", (state, init_occupancy(cfg.grid))
)
renderer = build_renderer(cfg, field, for_eval=True)
res = render_dataset_view_result(
    renderer, state.params, scene["test"], 0, cfg.scene.scene_scale,
    chunk_size=cfg.render.chunk_size,
    occupancy=renderer_payload(occ, cfg.sampler, cfg.grid),
)
write_png(f"{out_dir}/example_view.png", np.asarray(res.rgb))
write_png(f"{out_dir}/example_depth.png", depth_image(res.depth, res.acc))
print(f"wrote {out_dir}/example_view.png (+ depth) from step {step}")
