"""Right-size the CDF speed tier's ray-compaction capacity under the
32^3 in-kernel mask (round-5): the tier ships ray_compact_fraction=0.75
(sized for the round-3 16^3-pooled keep fraction of 0.65-0.70), but the
finer 32^3 pooling keeps FEWER rays — a lower capacity schedules fewer
kernel rows at identical output (over-capacity only drops rays when
keep > capacity).

Method: measure the actual keep fraction of the trained gate occupancy
at the kernel's pooling on a probe view (grid_renderer.ray_keep_fraction
with the fused pool override), then time the tier at capacity ladder
{0.60, 0.65, 0.70, 0.75} under the protocol of record, and emit the
smallest capacity with >= 0.03 margin above the measured keep plus its
fps.  A same-checkpoint parity artifact at the chosen capacity is
written via tools/render_parity.py --fast-overrides.

Output: runs/cdf_tier_tune.json + the parity artifact
runs/hard_r4_fused_cdf_p32/render_parity_tuned.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from tnerf.cameras import camera_rays
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.grid_renderer import ray_keep_fraction
    from tnerf.render.pallas_fused2 import (
        make_fused_pipeline_renderer_v2,
        select_coarse_res,
    )

    run = "runs/hard_r4_fused_cdf_p32"
    cfg = Config.from_json_file("configs/procedural_hard_fused_cdf.json")
    field = NeRFField(cfg.field_, cfg.grid)
    tparams, occ, trained = bench._restore_gate(field, cfg, run)
    assert trained, f"no checkpoint under {run}"
    params = jax.device_put(tparams)
    occ3 = jnp.asarray(occ)

    # keep fraction at the kernel's own pooling, probe view = a test
    # camera of the gate scene's rig (bench's camera variants)
    (o, d, v), = bench._camera_ray_variants(800, 800, n_variants=1)
    from tnerf.cameras import Rays

    probe = Rays(origins=o, directions=d, viewdirs_tp=v)
    pool = select_coarse_res(cfg.render, cfg.grid.resolution)
    kf = ray_keep_fraction(probe, occ3, cfg.grid, cfg.sampler, pool_res=pool)
    out = {"run": run, "pool_res": pool, "keep_fraction": round(float(kf), 4)}

    n = 800 * 800
    n_chunks = -(-n // 32768)
    chunk = n // n_chunks
    oc = o[::n_chunks][:chunk]
    dc = d[::n_chunks][:chunk]
    vc = v[::n_chunks][:chunk]

    ladder = [0.60, 0.65, 0.70, 0.75]
    fps_at = {}
    for frac in ladder:
        c2 = cfg.apply_overrides([f"render.ray_compact_fraction={frac}"])
        rend = make_fused_pipeline_renderer_v2(
            c2.field_, c2.grid, c2.sampler, c2.render,
            rpc=c2.render.fused_rpc, tighten=True, b_tile=16,
            ray_compact=True,
        )

        def chunk_scalar(o2):
            rays = Rays(origins=o2, directions=dc, viewdirs_tp=vc)
            return rend(params, rays, None, occ3).rgb.sum()

        dt_med, dt_min, dt_max = bench._diff_timeit_spread(chunk_scalar, oc)
        fps_at[str(frac)] = [
            round(1.0 / (dt_med * n_chunks), 2),
            round(1.0 / (dt_max * n_chunks), 2),
            round(1.0 / (dt_min * n_chunks), 2),
        ]
    out["fps_at_fraction"] = fps_at
    safe = [f for f in ladder if f >= float(kf) + 0.03]
    chosen = min(safe) if safe else 0.75
    out["chosen_fraction"] = chosen
    os.makedirs("runs", exist_ok=True)
    with open("runs/cdf_tier_tune.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("CDF_TIER_TUNE " + json.dumps(out))

    if chosen < 0.75:
        import subprocess

        rc = subprocess.call([
            sys.executable, "tools/render_parity.py",
            "--config", "configs/procedural_hard_fused_cdf.json",
            "--run", run, "--out", "render_parity_tuned.json",
            "--fast-overrides", f"render.ray_compact_fraction={chosen}",
        ])
        print(f"parity_tuned rc={rc}")


if __name__ == "__main__":
    main()
