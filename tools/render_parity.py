"""Same-checkpoint render parity: the north-star clause (BASELINE.md)
requires the fast fused renderer to stay within 0.5 dB of the march
renderer ON THE SAME TRAINED CHECKPOINT, measured on the full test
split at gate resolution.  This tool produces that number of record:

    python tools/render_parity.py \
        --config configs/procedural_hard_fused.json \
        --run runs/hard_r3_fused_rpc2

renders the checkpoint through (a) the config's own fused renderer and
(b) the march renderer at the SAME quadrature contract (pipeline
override only — samples_per_ray / tighten / mask knobs come from the
same config), evaluates both over the whole test split, and writes
<run>/render_parity.json; bench.py gate_metrics() reports it as the
fused_march_parity_db extra.  Replaces doc-only parity claims with a
committed artifact (round-2 verdict weak-#6)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--run", required=True, help="run dir with checkpoints/")
    p.add_argument("--out", default="render_parity.json",
                   help="output filename inside --run")
    p.add_argument("--max-views", type=int, default=None,
                   help="evaluate only the first N test views (smoke runs; "
                   "the number of record uses the full split)")
    p.add_argument("--march-overrides", nargs="*", default=[],
                   help="extra dotted overrides applied to the MARCH side "
                   "only (e.g. sampler.placement=uniform "
                   "sampler.samples_per_ray=64) — for parity against a "
                   "HIGHER-quality march quadrature than the fast config's "
                   "own; the default (none) keeps the same-quadrature "
                   "kernel-parity contract")
    p.add_argument("--fast-overrides", nargs="*", default=[],
                   help="extra dotted overrides applied to the FAST side "
                   "only — e.g. the turbo tier's render knobs on top of "
                   "the gate config, or a march-family fast-render shape "
                   "(CP/triplane) vs its own gate eval quadrature")
    args = p.parse_args(argv)

    from tnerf.cli import _restore_state
    from tnerf.config import Config
    from tnerf.data.dataset import load_data, scene_proc_kwargs
    from tnerf.eval import evaluate
    from tnerf.grid.occupancy import init_occupancy, renderer_payload
    from tnerf.train import create_optimizer, init_train_state
    from tnerf.train_loop import build_field, build_renderer

    cfg = Config.from_json_file(args.config)
    datasets = load_data(
        cfg.scene.kind, cfg.scene.name, root=cfg.scene.root,
        srgb_to_linear=cfg.scene.srgb_to_linear, downscale=cfg.scene.downscale,
        proc=scene_proc_kwargs(cfg.scene),
    )
    test = datasets["test"]

    out = {"config": args.config, "run": args.run}
    if args.fast_overrides:
        out["fast_overrides"] = list(args.fast_overrides)
    for tag, overrides in (
        ("fused", list(args.fast_overrides)),
        ("march", ["render.pipeline=grid_march"] + args.march_overrides),
    ):
        c = cfg.apply_overrides(overrides)
        field = build_field(c)
        renderer = build_renderer(c, field, for_eval=True)
        optimizer = create_optimizer(c.train)
        state = init_train_state(field, optimizer, c.train.seed)
        occ = init_occupancy(c.grid)
        step, state, occ, err = _restore_state(
            os.path.join(args.run, "checkpoints"), state, occ
        )
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 1
        m = evaluate(
            renderer, state.params, test, c.scene.scene_scale,
            white_background=c.scene.white_background,
            max_views=args.max_views,
            chunk_size=c.render.chunk_size,
            occupancy=renderer_payload(occ, c.sampler, c.grid),
        )
        out[tag] = {k: round(v, 4) for k, v in m.items()}
        out[f"{tag}_step"] = step
        print(f"{tag}: {out[tag]}", flush=True)

    out["parity_db"] = round(
        abs(out["march"]["psnr_test"] - out["fused"]["psnr_test"]), 4
    )
    path = os.path.join(args.run, args.out)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path}: parity {out['parity_db']} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
