"""Attribute the real-training-loop vs isolated-step throughput gap
(round-4 verdict missing #2): the flagship fused config's isolated train
step measures ~582k rays/s (bench_fused_train) but the real loop logs
~190-260k (gate metrics).  Where do the cycles go?

Method: run the SAME flagship config for a short window under a ladder
of ablations, reading the loop's own logged rays/s windows (median of
the second half — the gate_metrics protocol, robust to async-dispatch
window averaging):

    bare      eval off, checkpoints off, occupancy refresh OFF
              (update_every > steps), logging window large
              -> step + host batch sampling + dispatch only
    occ       + occupancy refresh at the config cadence (the density
              probe + EMA + bitfield rebuild every update_every steps)
    eval      + a mid-run eval (amortized eval cost)
    full      the config's own cadence (what the gates run)

Deltas between rungs attribute the gap; the residual between `bare`
and the isolated-step bench number is dispatch + host input pipeline.
Writes runs/loop_breakdown/summary.json; docs/KERNEL_NOTES.md carries
the adjudicated percentages.

Run on TPU (tools/tpu_queue_r5b.sh); ~2 min/rung.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, overrides, steps=900):
    from tnerf.config import Config
    from tnerf.train_loop import run_training

    cfg = Config.from_json_file("configs/procedural_hard_fused.json")
    cfg = cfg.apply_overrides([
        f"train.steps={steps}", "train.assert_test_psnr_min=0",
        "train.keep_best=false",
        f"logging.out_dir=runs/loop_breakdown/{name}",
        *overrides,
    ])
    run_training(cfg)
    rates = []
    with open(f"runs/loop_breakdown/{name}/metrics.jsonl") as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "rays_per_sec" in rec:
                rates.append(float(rec["rays_per_sec"]))
    tail = sorted(rates[len(rates) // 2:])
    med = tail[len(tail) // 2] if tail else 0.0
    return round(med / 1e3, 1)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    out = {"steps": steps, "config": "configs/procedural_hard_fused.json"}
    out["bare_krays_per_sec"] = run_variant("bare", [
        "train.eval_every=0", "train.checkpoint_every=0",
        f"grid.update_every={10 * steps}", "train.log_every=50",
    ], steps)
    out["occ_krays_per_sec"] = run_variant("occ", [
        "train.eval_every=0", "train.checkpoint_every=0",
        "train.log_every=50",
    ], steps)
    out["eval_krays_per_sec"] = run_variant("eval", [
        f"train.eval_every={steps // 2}", "train.checkpoint_every=0",
        "train.log_every=50",
    ], steps)
    out["full_krays_per_sec"] = run_variant("full", [
        f"train.eval_every={steps // 2}",
        f"train.checkpoint_every={steps // 2}", "train.log_every=250",
    ], steps)
    os.makedirs("runs/loop_breakdown", exist_ok=True)
    with open("runs/loop_breakdown/summary.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("LOOP_BREAKDOWN " + json.dumps(out))


if __name__ == "__main__":
    main()
