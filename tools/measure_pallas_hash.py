"""Measure the fused Pallas hash-encode against the XLA one-hot and
gather formulations on the real chip (the last un-measured kernel
decision of round 3 — docs/ROUND3.md continuation 2 shipped the kernel
behind explicit hash_gather_mode=pallas pending this measurement).

Times (a) encode-only forward, (b) encode forward+backward through a
table-gradient loss, and (c) a full hashgrid train step through the
compacted march renderer — the same differential lax.scan slope
methodology as bench.py (transport-proof on the axon relay).

Both table sizes of record are measured: T=2^14 (the repo's measured
fast-path default, configs/procedural_hard_hashgrid.json) and T=2^19
(tcnn's own default, /root/reference/main.cu:35-69) — at 2^19 the
one-hot MXU path is shape-infeasible ([N, 2^19] one-hots), so the
contest there is pallas vs the XLA gather path that currently makes
reference_parity.json slow (round-3 verdict, missing #2).

    python tools/measure_pallas_hash.py  # writes runs/pallas_hash_measure.json
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import _camera_ray_variants, _diff_timeit
    from tnerf.cameras import Rays
    from tnerf.config import Config
    from tnerf.data.procedural import analytic_field
    from tnerf.fields.hashgrid import apply_hashgrid, init_hashgrid
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.grid.occupancy import cell_centers
    from tnerf.render.grid_renderer import make_grid_renderer

    res, samples, batch = 64, 128, 8192
    cfg = Config().apply_overrides([
        f"grid.resolution={res}", f"sampler.samples_per_ray={samples}",
        "sampler.near=2.0", "sampler.far=5.5", "scene.scene_scale=1.0",
        "field_.encoding=hashgrid", "field_.hash_log2_table_size=14",
        "sampler.tighten_res=32", "sampler.occupancy_mask_res=0",
    ])
    _, sigma = analytic_field(cell_centers(cfg.grid).reshape(-1, 3))
    occ = jnp.asarray((sigma > 0.5).reshape(res, res, res))

    (o, d, v), = _camera_ray_variants(800, 800, n_variants=1)
    n = 800 * 800
    mid = max(0, n // 2 - batch // 2)
    o, d, v = o[mid:mid + batch], d[mid:mid + batch], v[mid:mid + batch]
    gt = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, 3)).astype(np.float32)
    )
    opt = optax.adam(1e-3)

    # -- (a)/(b): encode-only micro-benchmarks on a flat sample tensor
    n_samples = 262144
    key = jax.random.PRNGKey(0)
    x01 = jax.random.uniform(key, (n_samples, 3), jnp.float32)

    out_path = os.path.join(_REPO, "runs/pallas_hash_measure.json")
    os.makedirs(os.path.join(_REPO, "runs"), exist_ok=True)
    out = {"n_samples_encode": n_samples, "batch": batch,
           "samples_per_ray": samples}

    def flush():
        # incremental: a timeout-killed run keeps everything measured so far
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    # onehot at 2^19 is shape-infeasible ([N, 2^19] one-hot matmuls);
    # gather vs pallas is the contest there.
    for log2T, modes in ((14, ("onehot", "pallas", "gather")),
                         (19, ("pallas", "gather"))):
        fcfg = cfg.apply_overrides([
            f"field_.hash_log2_table_size={log2T}"]).field_
        enc_params = init_hashgrid(jax.random.PRNGKey(1), fcfg)

        for m in modes:
            def enc_fwd(x0):
                return apply_hashgrid(enc_params, x0, fcfg, mode=m).sum()

            def enc_bwd(x0):
                def loss(p):
                    f = apply_hashgrid(p, x0, fcfg, mode=m)
                    return jnp.mean(f * f)
                l, g = jax.value_and_grad(loss)(enc_params)
                return l + sum(
                    jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g)
                ) * 1e-9

            try:
                t_f = _diff_timeit(enc_fwd, x01, inner=(2, 8))
                t_b = _diff_timeit(enc_bwd, x01, inner=(2, 6))
                out[f"t{log2T}_{m}_encode_fwd_msamples_per_sec"] = round(
                    n_samples / t_f / 1e6, 2)
                out[f"t{log2T}_{m}_encode_fwdbwd_msamples_per_sec"] = round(
                    n_samples / t_b / 1e6, 2)
            except Exception as e:  # noqa: BLE001 — record and continue
                out[f"error_t{log2T}_{m}_encode"] = f"{type(e).__name__}: {e}"[:200]
            flush()

    # -- (c): full train step through the compacted renderer
    for log2T, m in ((14, "onehot"), (14, "pallas"),
                     (19, "gather"), (19, "pallas")):
        c2 = cfg.apply_overrides([
            f"field_.hash_gather_mode={m}",
            f"field_.hash_log2_table_size={log2T}"])
        field = NeRFField(c2.field_, c2.grid, arch="twobranch")
        params = jax.device_put(field.init(jax.random.PRNGKey(0)))
        ost = jax.device_put(opt.init(params))
        rend = make_grid_renderer(
            field, c2.grid, c2.sampler, c2.render, strategy="march",
            compact=True, compact_capacity=batch * samples // 2,
        )

        def step(o2):
            rays = Rays(origins=o2, directions=d, viewdirs_tp=v)

            def loss_fn(p):
                return jnp.mean((rend(p, rays, None, occ).rgb - gt) ** 2)

            l, g = jax.value_and_grad(loss_fn)(params)
            up, _ = opt.update(g, ost)
            return l + sum(jnp.sum(jnp.abs(u)) for u in jax.tree.leaves(up)) * 1e-12

        try:
            t_s = _diff_timeit(step, o, inner=(2, 5))
            out[f"t{log2T}_{m}_train_krays_per_sec"] = round(
                batch / t_s / 1e3, 1)
        except Exception as e:  # noqa: BLE001
            out[f"error_t{log2T}_{m}_train"] = f"{type(e).__name__}: {e}"[:200]
        flush()

    flush()
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
