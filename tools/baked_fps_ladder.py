"""Baked-render fps knob ladder: once the field is a lookup, the march
path's FIXED sampling costs bind (measured 4.92 fps at the quality
gate's CDF quadrature vs 1.20 for the direct hashgrid render).  Which
knob buys the next factor — dropping the CDF placement (bins fold +
inverse-CDF one-hot sums), widening uniform sampling, or the sample
count itself?

Times the baked render of the hashgrid gate bake under:
    cdf24    S=24 occupancy_cdf bins=64  (the gate quadrature; baseline)
    uni32    S=32 uniform placement      (no CDF machinery)
    uni48    S=48 uniform
    uni32_nc S=32 uniform, chunk 65536   (fewer per-frame launches)

Writes runs/baked_fps_ladder.json.  Quality note: uniform-S placement
over the tightened span was the round-3 render quadrature (march gates
measured it at -0.7..-1.2 dB vs CDF at equal S); the fps-per-quality
call belongs in configs/README once both axes are measured.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from tnerf.cameras import Rays
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.baked import bake_field, make_baked_renderer

    run = "runs/hard_r3_hashgrid_cdf"
    base = Config.from_json_file(f"{run}/config.json").apply_overrides([
        "sampler.occupancy_mask_res=32", "render.compact=false",
    ])
    field = NeRFField(base.field_, base.grid, arch="twobranch")
    tparams, occ, trained = bench._restore_gate(field, base, run)
    assert trained
    occ3 = jnp.asarray(occ)
    table = bake_field(
        field, jax.device_put(tparams), base.grid, bake_res=320,
        occupancy=occ3,
    )

    (o, d, v), = bench._camera_ray_variants(800, 800, n_variants=1)
    n = 800 * 800

    out = {"run": run, "bake_res": 320}
    ladder = {
        "cdf24": ["sampler.samples_per_ray=24",
                  "sampler.placement=occupancy_cdf", "sampler.cdf_bins=64"],
        "uni32": ["sampler.samples_per_ray=32", "sampler.placement=uniform"],
        "uni48": ["sampler.samples_per_ray=48", "sampler.placement=uniform"],
        "uni32_c64k": ["sampler.samples_per_ray=32",
                       "sampler.placement=uniform", "render.chunk_size=65536"],
        # round-2 ladder: is the double fold-kernel launch of the
        # ray-compacted path (pass 1 keep + pass 2 per-kept) worth its
        # cost when the field is a lookup?  And the bins/probes knobs:
        "cdf24_nocompact": ["sampler.samples_per_ray=24",
                            "sampler.placement=occupancy_cdf",
                            "sampler.cdf_bins=64",
                            "render.ray_compact=false"],
        "cdf24_p32": ["sampler.samples_per_ray=24",
                      "sampler.placement=occupancy_cdf",
                      "sampler.cdf_bins=32"],
        "cdf16": ["sampler.samples_per_ray=16",
                  "sampler.placement=occupancy_cdf", "sampler.cdf_bins=64"],
        "cdf24_probes32": ["sampler.samples_per_ray=24",
                           "sampler.placement=occupancy_cdf",
                           "sampler.cdf_bins=64",
                           "sampler.tighten_probes=32"],
    }
    for name, ov in ladder.items():
        cfg = base.apply_overrides(ov)
        cs = cfg.render.chunk_size
        n_chunks = -(-n // cs)
        chunk = n // n_chunks
        oc, dc, vc = (a[::n_chunks][:chunk] for a in (o, d, v))
        rend = make_baked_renderer(
            table, 320, cfg.grid, cfg.sampler, cfg.render
        )

        def chunk_scalar(o2, tbl):
            rays = Rays(origins=o2, directions=dc, viewdirs_tp=vc)
            return rend({"table": tbl}, rays, None, occ3).rgb.sum()

        dt_med, dt_min, dt_max = bench._diff_timeit_spread(
            chunk_scalar, oc, args=(rend.params["table"],)
        )
        out[name] = [
            round(1.0 / (dt_med * n_chunks), 2),
            round(1.0 / (dt_max * n_chunks), 2),
            round(1.0 / (dt_min * n_chunks), 2),
        ]
    with open("runs/baked_fps_ladder.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("BAKED_FPS_LADDER " + json.dumps(out))


if __name__ == "__main__":
    main()
