"""Summarize training runs as a markdown table.

Usage: python tools/summarize_runs.py [runs_dir ...]

Reads each run directory's metrics.jsonl (and config.json when the run
recorded one — runs are self-describing since round 3) and prints one
row per run: final test/val PSNR (mean + worst view), SSIM, best
checkpoint PSNR, steady-state training throughput, steps, and the
config knobs that differ from defaults (truncated).  The numbers of
record for benchmarks remain BENCH_r*.json; this tool is for run
triage and docs refresh.
"""

from __future__ import annotations

import json
import os
import sys


def summarize_run(run_dir: str) -> dict | None:
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.isfile(path):
        return None
    last = {}
    rays = []
    steps = 0
    best = None
    with open(path) as fh:
        for line in fh:
            try:
                d = json.loads(line)
            except ValueError:
                continue
            steps = max(steps, int(d.get("step", 0)))
            if "rays_per_sec" in d:
                rays.append(float(d["rays_per_sec"]))
            if "best_psnr" in d:
                best = float(d["best_psnr"])
            for k in ("psnr_test", "psnr_test_min", "ssim_test",
                      "psnr_val", "psnr_val_min"):
                if k in d:
                    last[k] = float(d[k])
    # steady state: median of the second half of throughput samples
    # (skips compile-dominated early windows)
    rate = None
    if rays:
        tail = sorted(rays[len(rays) // 2:])
        rate = tail[len(tail) // 2]
    diff = ""
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.isfile(cfg_path):
        try:
            sys.path.insert(0, os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            from tnerf.config import Config

            diff = " ".join(
                Config.from_json_file(cfg_path).diff_overrides()
            )
        except Exception as e:  # stale schema etc. — summary still useful
            diff = f"(config unreadable: {e})"
    return {
        "run": os.path.basename(run_dir.rstrip("/")),
        "steps": steps,
        "psnr_test": last.get("psnr_test"),
        "psnr_test_min": last.get("psnr_test_min"),
        "ssim_test": last.get("ssim_test"),
        "best_psnr": best,
        "krays_per_sec": None if rate is None else rate / 1e3,
        "config_diff": diff,
    }


def main(argv: list[str]) -> int:
    roots = argv[1:] or ["runs"]
    rows = []
    for root in roots:
        if os.path.isfile(os.path.join(root, "metrics.jsonl")):
            candidates = [root]
        elif os.path.isdir(root):
            candidates = sorted(
                os.path.join(root, d) for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))
            )
        else:
            print(f"warning: {root} is not a directory", file=sys.stderr)
            candidates = []
        for c in candidates:
            s = summarize_run(c)
            if s is not None:
                rows.append(s)
    if not rows:
        print("no runs found", file=sys.stderr)
        return 1
    fmt = lambda v, p=2: "-" if v is None else f"{v:.{p}f}"
    print("| run | steps | psnr_test (min) | ssim | best | krays/s | config |")
    print("|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -(r["psnr_test"] or 0)):
        diff = r["config_diff"]
        if len(diff) > 90:
            diff = diff[:87] + "..."
        print(
            f"| {r['run']} | {r['steps']} "
            f"| {fmt(r['psnr_test'])} ({fmt(r['psnr_test_min'])}) "
            f"| {fmt(r['ssim_test'], 3)} | {fmt(r['best_psnr'])} "
            f"| {fmt(r['krays_per_sec'], 1)} | {diff} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
