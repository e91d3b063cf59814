"""Measure the hash-encode formulations (MXU one-hot vs XLA gather)
on the real chip, at both table sizes of record.  This tool ORIGINALLY
also measured the fused Pallas hash-encode kernel; that contest is now
ADJUDICATED and the kernel deleted (round 4): pallas fwd 10.29 vs
onehot 14.69 Msamples/s at T=2^14 N=65536, and the pallas backward ran
out of VMEM at production L=16 on v5e (the [L, T/128, F*128] f32
table-grad accumulation block) — docs/KERNEL_NOTES.md round-4 verdict.

Times (a) encode-only forward, (b) encode forward+backward through a
table-gradient loss, and (c) a full hashgrid train step through the
compacted march renderer — the same differential lax.scan slope
methodology as bench.py (transport-proof on the axon relay).

Both table sizes of record are measured: T=2^14 (the repo's measured
fast-path default, configs/procedural_hard_hashgrid.json) and T=2^19
(tcnn's own default, /root/reference/main.cu:35-69) — at 2^19 the
one-hot MXU path is shape-infeasible ([N, 2^19] one-hots), so only the
XLA gather path remains; its measured rate documents the T<=2^15
envelope as a design decision (round-3 verdict, missing #2).

Each (phase, table-size, mode) runs in its OWN subprocess: the axon
remote-compile helper intermittently dies (HTTP 500, subprocess exit 1)
on large scan-wrapped gather compiles; isolation plus the smaller N_ENC
makes the sweep reliable.  Results merge incrementally into
runs/pallas_hash_measure.json so a timeout keeps partial results.

    python tools/measure_pallas_hash.py            # full sweep
    python tools/measure_pallas_hash.py --one enc:14:onehot   # child mode
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SPECS = [
    "enc:14:onehot", "enc:14:gather",
    "enc:19:gather",
    "train:14:onehot",
    "train:19:gather",
]

# 65536: the size at which every formulation compiles reliably through
# the axon remote-compile helper (262144 scan-wrapped gather/pallas
# compiles intermittently 500 it); rates are slope-based so the smaller
# N changes amortization, not the per-sample number (onehot fwd: 14.46
# at 262144 vs 14.69 at 65536).
N_ENC = 65536
BATCH, SAMPLES, RES = 8192, 128, 64


def _cfg(log2T, mode=None):
    from tnerf.config import Config

    ov = [
        f"grid.resolution={RES}", f"sampler.samples_per_ray={SAMPLES}",
        "sampler.near=2.0", "sampler.far=5.5", "scene.scene_scale=1.0",
        "field_.encoding=hashgrid", f"field_.hash_log2_table_size={log2T}",
        "sampler.tighten_res=32", "sampler.occupancy_mask_res=0",
    ]
    if mode is not None:
        ov.append(f"field_.hash_gather_mode={mode}")
    return Config().apply_overrides(ov)


def run_one(spec: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import _camera_ray_variants, _diff_timeit
    from tnerf.cameras import Rays
    from tnerf.data.procedural import analytic_field
    from tnerf.fields.hashgrid import apply_hashgrid, init_hashgrid
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.grid.occupancy import cell_centers
    from tnerf.render.grid_renderer import make_grid_renderer

    phase, log2T_s, mode = spec.split(":")
    log2T = int(log2T_s)
    out = {}
    if phase == "enc":
        fcfg = _cfg(log2T).field_
        enc_params = init_hashgrid(jax.random.PRNGKey(1), fcfg)
        x01 = jax.random.uniform(jax.random.PRNGKey(0), (N_ENC, 3), jnp.float32)

        def enc_fwd(x0):
            return apply_hashgrid(enc_params, x0, fcfg, mode=mode).sum()

        def enc_bwd(x0):
            def loss(p):
                f = apply_hashgrid(p, x0, fcfg, mode=mode)
                return jnp.mean(f * f)
            l, g = jax.value_and_grad(loss)(enc_params)
            return l + sum(
                jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g)
            ) * 1e-9

        t_f = _diff_timeit(enc_fwd, x01, inner=(2, 8))
        out[f"t{log2T}_{mode}_encode_fwd_msamples_per_sec"] = round(
            N_ENC / t_f / 1e6, 2)
        t_b = _diff_timeit(enc_bwd, x01, inner=(2, 6))
        out[f"t{log2T}_{mode}_encode_fwdbwd_msamples_per_sec"] = round(
            N_ENC / t_b / 1e6, 2)
        return out

    # phase == "train": full step through the compacted march renderer
    c2 = _cfg(log2T, mode)
    _, sigma = analytic_field(cell_centers(c2.grid).reshape(-1, 3))
    occ = jnp.asarray((sigma > 0.5).reshape(RES, RES, RES))
    (o, d, v), = _camera_ray_variants(800, 800, n_variants=1)
    n = 800 * 800
    mid = max(0, n // 2 - BATCH // 2)
    o, d, v = o[mid:mid + BATCH], d[mid:mid + BATCH], v[mid:mid + BATCH]
    gt = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (BATCH, 3)).astype(np.float32)
    )
    opt = optax.adam(1e-3)
    field = NeRFField(c2.field_, c2.grid, arch="twobranch")
    params = jax.device_put(field.init(jax.random.PRNGKey(0)))
    ost = jax.device_put(opt.init(params))
    rend = make_grid_renderer(
        field, c2.grid, c2.sampler, c2.render, strategy="march",
        compact=True, compact_capacity=BATCH * SAMPLES // 2,
    )

    def step(o2):
        rays = Rays(origins=o2, directions=d, viewdirs_tp=v)

        def loss_fn(p):
            return jnp.mean((rend(p, rays, None, occ).rgb - gt) ** 2)

        l, g = jax.value_and_grad(loss_fn)(params)
        up, _ = opt.update(g, ost)
        return l + sum(jnp.sum(jnp.abs(u)) for u in jax.tree.leaves(up)) * 1e-12

    t_s = _diff_timeit(step, o, inner=(2, 5))
    out[f"t{log2T}_{mode}_train_krays_per_sec"] = round(BATCH / t_s / 1e3, 1)
    return out


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        try:
            res = run_one(sys.argv[2])
        except Exception as e:  # noqa: BLE001 — parent records it
            res = {f"error_{sys.argv[2].replace(':', '_')}":
                   f"{type(e).__name__}: {e}"[:200]}
        print("RESULT " + json.dumps(res))
        return 0

    out_path = os.path.join(_REPO, "runs/pallas_hash_measure.json")
    os.makedirs(os.path.join(_REPO, "runs"), exist_ok=True)
    out = {"n_samples_encode": N_ENC, "batch": BATCH,
           "samples_per_ray": SAMPLES}
    for spec in SPECS:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", spec],
                capture_output=True, text=True, timeout=600, cwd=_REPO,
            )
            line = next(
                (ln for ln in reversed(proc.stdout.splitlines())
                 if ln.startswith("RESULT ")), None,
            )
            if line is None:
                out[f"error_{spec.replace(':', '_')}"] = (
                    f"rc={proc.returncode}: {proc.stderr[-180:]}"
                )
            else:
                out.update(json.loads(line[len("RESULT "):]))
        except subprocess.TimeoutExpired:
            out[f"error_{spec.replace(':', '_')}"] = "subprocess timeout"
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(spec, "->", {k: v for k, v in out.items()
                           if spec.split(":")[1] in k.split("_")[0][1:]
                           or spec.replace(":", "_") in k}, flush=True)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
