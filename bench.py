"""Benchmark harness (driver entry: prints ONE JSON line).

Primary metric: ray-march throughput (Mrays/sec) at the reference's own
workload — 800x800 camera rays marched through an 8^3 grid into per-cell
interval lists with 24-hit capacity (reference main.cu:394,486,506-508).
This is the capability rtx_nerf accelerates with RT cores; BASELINE.json's
north star asks for >=100 Mrays/sec on one v5e chip.

Also reported (extra keys): 128^3-grid march throughput and full-pipeline
render throughput (traversal + field + composite) with frames/sec at
800x800.

Timing methodology: every external timing scheme through this transport
(queued, chained-across-launches, per-call synced) reads falsely fast for
short launches, and value fetches can add multi-second flat overheads.
All measurements therefore run the workload N times INSIDE one jit via
lax.scan with a serially-dependent carry (forcing real sequential device
execution) and report the SLOPE between two different N — which cancels
every fixed overhead.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _diff_timeit_spread(scalar_fn, o, runs=3, inner=(2, 12), reps=4,
                        args=()):
    """The fps PROTOCOL OF RECORD (docs/ROUND4.md): `runs` independent
    _diff_timeit measurements at inner=(2,12), reps=4; returns
    (median_dt, min_dt, max_dt).  Single _diff_timeit calls have ±10%
    run-to-run variance on this transport (a single favorable run once
    overstated a tier by 20%), so every number of record carries its
    spread and the median is the quoted value."""
    dts = sorted(_diff_timeit(scalar_fn, o, inner=inner, reps=reps,
                              args=args)
                 for _ in range(runs))
    return dts[len(dts) // 2], dts[0], dts[-1]


def _diff_timeit(scalar_fn, o, inner=(2, 10), reps=2, args=()):
    """Differential in-program timing: scalar_fn(o_perturbed, *args) ->
    scalar is run `inner[i]` times inside one jit (lax.scan, serially-
    dependent carry); per-iteration time is the slope between the two
    walls.  Returns seconds per iteration.

    args: extra values passed through as jit ARGUMENTS — anything large
    (e.g. a 2 GB baked table) must ride here, not in scalar_fn's
    closure, or it gets captured as a program constant and rejected by
    the remote-compile relay."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def many(o, *a):
            def body(carry, _):
                s = scalar_fn(o + carry * 1e-4, *a)
                f = s * 1e-3
                return f - jnp.floor(f), s
            carry, ss = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return ss.sum()
        return many

    def wall(fn):
        float(fn(o, *args))  # compile + warm (+ value fetch)
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(o, *args))
        return (time.perf_counter() - t0) / reps

    w1 = wall(make(inner[0]))
    w2 = wall(make(inner[1]))
    return max((w2 - w1) / (inner[1] - inner[0]), 1e-9)


# ---------------------------------------------------------------------------
# MFU accounting (round-5, VERDICT r4 missing #2): analytic MXU-scheduled
# FLOPs per sample per field family, divided into the measured rates.
# "Scheduled" counts the dense matmul work the formulation actually issues
# at its STATIC shapes — one-hot encode matmuls count their full 2*T*F,
# compaction capacities count at capacity, masked/padded lanes count.
# This is hardware utilization (how close the MXU runs to peak), not
# useful-math efficiency; a gather architecture would do ~8 interp FLOPs
# where the one-hot path schedules 2*T*F on purpose (KERNEL_NOTES).
# Train steps count fwd+bwd as 3x forward (dX and dW matmuls).
# ---------------------------------------------------------------------------

V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e bf16 peak, FLOP/s per chip


def _mlp_fwd_flops(width: int, n_mats: int) -> float:
    """Forward FLOPs/sample of an n_mats-matmul MLP at `width` lanes (the
    fused kernel runs hidden_layers+1 [128,128] matmuls; the XLA paths'
    input/head layers are approximated as full width x width)."""
    return 2.0 * width * width * n_mats


def _field_fwd_flops(field_cfg) -> float:
    """Analytic forward FLOPs per FIELD EVALUATION (encode + MLP) for
    each family, at the shapes the production formulations schedule."""
    enc = field_cfg.encoding
    if enc == "frequency":
        return _mlp_fwd_flops(
            field_cfg.hidden_width, field_cfg.hidden_layers + 1
        )
    mlp = _mlp_fwd_flops(
        field_cfg.hash_hidden_width
        if enc == "hashgrid" else field_cfg.tri_hidden_width,
        (field_cfg.hash_hidden_layers
         if enc == "hashgrid" else field_cfg.tri_hidden_layers) + 1,
    )
    if enc == "hashgrid":
        T = 2 ** field_cfg.hash_log2_table_size
        F = field_cfg.hash_features_per_level
        return field_cfg.hash_levels * 2.0 * T * F + mlp
    R, F = field_cfg.tri_resolution, field_cfg.tri_features
    if enc == "triplane":
        # 3 plane one-hot matmuls [C,R] @ [R, R*F] + 3 line lookups
        return 3 * 2.0 * R * R * F + 3 * 2.0 * R * F + mlp
    if enc == "cp":
        return 3 * 2.0 * R * F + mlp
    return mlp


def _mfu(samples_per_sec: float, fwd_flops: float, train: bool = False):
    """Fraction of v5e bf16 peak the given rate sustains."""
    factor = 3.0 if train else 1.0
    return round(samples_per_sec * fwd_flops * factor / V5E_BF16_PEAK_FLOPS, 4)


def _camera_ray_variants(width: int, height: int, n_variants: int = 4):
    import jax.numpy as jnp

    from tnerf.cameras import camera_rays, focal_from_angle
    from tnerf.data.procedural import CAMERA_ANGLE_X, sphere_poses

    poses = sphere_poses(n_variants, radius=3.5, seed=0)
    focal = focal_from_angle(width, CAMERA_ANGLE_X)
    out = []
    for i in range(n_variants):
        rays = camera_rays(jnp.asarray(poses[i]), width, height, focal)
        n = width * height
        out.append(
            (
                rays.origins.reshape(n, 3),
                rays.directions.reshape(n, 3),
                rays.viewdirs_tp.reshape(n, 2),
            )
        )
    return out


def bench_ray_march(width=800, height=800, res=8, inner=(4, 36)) -> dict:
    """Traversal throughput: rays -> per-cell interval lists (the
    reference's OptiX ray-march stage, §3.3).

    Timing is TRANSPORT-PROOF DIFFERENTIAL: two launches run `inner[0]`
    and `inner[1]` traversals serially inside a lax.scan whose carry
    perturbs the ray origins (data dependence forces real sequential
    on-device execution); per-traversal time is the SLOPE between the two
    walls, which cancels any fixed transport overhead.  Every external
    timing scheme (queued, chained, per-call synced) proved untrustable
    on this relay for short launches."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from tnerf.config import GridConfig
    from tnerf.grid.traversal import traverse_grid

    grid = GridConfig(resolution=res)
    (o, d, _v), = _camera_ray_variants(width, height, n_variants=1)

    def make(n):
        @jax.jit
        def march_many(o, d):
            def body(carry, _):
                iv = traverse_grid(o + carry * 1e-4, d, grid)
                s = iv.t_starts.sum()
                f = s * 1e-7
                return f - jnp.floor(f), s
            carry, ss = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return carry, ss.sum()
        return march_many

    def wall(fn, reps=2):
        float(fn(o, d)[1])  # compile + warm (+ value fetch)
        t0 = _time.perf_counter()
        for _ in range(reps):
            float(fn(o, d)[1])  # value fetch forces real completion
        return (_time.perf_counter() - t0) / reps

    w1 = wall(make(inner[0]))
    w2 = wall(make(inner[1]))
    dt = max((w2 - w1) / (inner[1] - inner[0]), 1e-9)
    n_rays = width * height
    return {
        "mrays_per_sec": n_rays / dt / 1e6,
        "seconds_per_launch": dt,
        "n_rays": n_rays,
        "grid_res": res,
    }


def _restore_gate(field, cfg, ckpt_run):
    """Restore (params, occupancy payload as [res]^3 array, True) from a
    committed gate run, or (None, None, False) when absent (fresh clone
    without runs/).  The payload dtype follows cfg.sampler.placement
    (bool bitfield, or f32 density EMA for density_cdf) — see
    occupancy.renderer_payload."""
    import os

    import numpy as np

    if not (ckpt_run and os.path.isdir(os.path.join(ckpt_run, "checkpoints"))):
        return None, None, False
    from tnerf.grid.occupancy import init_occupancy, renderer_payload
    from tnerf.train import create_optimizer, init_train_state
    from tnerf.utils.checkpoint import restore_checkpoint

    state = init_train_state(field, create_optimizer(cfg.train), cfg.train.seed)
    occ0 = init_occupancy(cfg.grid)
    restored = restore_checkpoint(
        os.path.join(ckpt_run, "checkpoints"), (state, occ0)
    )
    if restored is None:
        return None, None, False
    _, (state, occ0) = restored
    res = cfg.grid.resolution
    payload = np.asarray(renderer_payload(occ0, cfg.sampler, cfg.grid))
    return state.params, payload.reshape(res, res, res), True


def bench_render(width=800, height=800, res=64, samples=128, overrides=(),
                 compact=False, strided=False, scene_field="prims",
                 config_file=None, ckpt_run=None, strategy="march") -> dict:
    """Full-pipeline render throughput (march + field + composite).

    strided=True times a STRIDED chunk (every n_chunks-th ray) instead of
    the center block — the mix render_image's chunk interleaving actually
    feeds each chunk, required for honest ray-compaction numbers.

    ckpt_run: path to a committed gate run — the TRAINED params and EMA
    occupancy are restored (config_file must be the gate's config so the
    shapes match).  A trained EMA grid keeps far more rays than the
    analytic sigma>0.5 grid (measured 0.58-0.70 vs 0.29-0.45 pooled —
    docs/KERNEL_NOTES.md round-3 addendum), so render-fps rows that feed
    compacted paths MUST time against it; the analytic fallback covers
    fresh clones without runs/."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tnerf.cameras import Rays
    from tnerf.config import Config
    from tnerf.data.procedural import FIELDS
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.grid.occupancy import cell_centers
    from tnerf.render.grid_renderer import make_grid_renderer

    base = (
        Config.from_json_file(config_file) if config_file else Config()
    )
    cfg = base.apply_overrides([
        f"grid.resolution={res}",
        f"sampler.samples_per_ray={samples}",
        "sampler.near=2.0", "sampler.far=5.5",
        "scene.scene_scale=1.0",
        *overrides,
    ])
    arch = (
        "twobranch" if cfg.field_.encoding in ("hashgrid", "triplane", "cp")
        else "fused5d"
    )
    field = NeRFField(cfg.field_, cfg.grid, arch=arch)
    params = field.init(jax.random.PRNGKey(0))
    tparams, occ, trained = _restore_gate(field, cfg, ckpt_run)
    if trained:
        params = tparams
    if occ is None:
        _, sigma = FIELDS[scene_field](cell_centers(cfg.grid).reshape(-1, 3))
        occ = (np.asarray(sigma) > 0.5).reshape(res, res, res)
    occ_frac = float(
        occ.mean() if occ.dtype == bool
        else (occ > cfg.grid.density_threshold).mean()
    )

    (o, d, v), = _camera_ray_variants(width, height, n_variants=1)
    n = width * height
    n_chunks = -(-n // 32768)
    if strided:
        chunk = n // n_chunks
        o, d, v = o[::n_chunks][:chunk], d[::n_chunks][:chunk], v[::n_chunks][:chunk]
    else:
        chunk = 32768
        mid = max(0, n // 2 - chunk // 2)  # center chunk: representative mix
        o, d, v = o[mid:mid + chunk], d[mid:mid + chunk], v[mid:mid + chunk]
    renderer = make_grid_renderer(
        field, cfg.grid, cfg.sampler, cfg.render,
        strategy=strategy, compact=compact,
    )

    def chunk_scalar(o2):
        rays = Rays(origins=o2, directions=d, viewdirs_tp=v)
        return renderer(params, rays, None, occ).rgb.sum()

    dt_chunk = _diff_timeit(chunk_scalar, o)
    dt = dt_chunk * n_chunks  # per 800x800 frame
    # MFU: field evaluations scheduled per second at the renderer's
    # static shapes — kept-ray capacity x S, then the per-sample
    # compaction capacity when compact=True (encode+MLP both run at
    # capacity in compacted_shade).
    keep = (
        cfg.render.ray_compact_fraction if cfg.render.ray_compact else 1.0
    )
    sched = chunk * keep * samples / dt_chunk
    if compact:
        sched = min(sched, chunk * samples * cfg.render.compact_fraction / dt_chunk)
    return {
        "render_mrays_per_sec": chunk / dt_chunk / 1e6,
        "fps_800x800": (1.0 / dt) if (width, height) == (800, 800) else None,
        "occupancy_frac": occ_frac,
        "samples_per_ray": samples,
        "field": cfg.field_.encoding,
        "trained_ckpt": trained,
        "mfu": _mfu(sched, _field_fwd_flops(cfg.field_)),
    }


def bench_march_pallas(width=800, height=800, res=128, inner=(2, 10)) -> dict:
    """Pallas DDA kernel march at 128^3 (the production traversal at NGP
    scale): rays on lanes, whole walk in registers — see
    tnerf/grid/pallas_dda.py.  Emits the full per-step interval stream
    (steps-major kernel layout)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from tnerf.config import GridConfig
    from tnerf.grid.pallas_dda import march_pallas_raw

    grid = GridConfig(resolution=res)
    (o, d, _v), = _camera_ray_variants(width, height, n_variants=1)

    def make(n):
        @jax.jit
        def march_many(o, d):
            def body(carry, _):
                t0s, cells, te, tx = march_pallas_raw(o + carry * 1e-4, d, grid)
                s = t0s.sum()
                f = s * 1e-7
                return f - jnp.floor(f), s
            carry, ss = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return carry, ss.sum()
        return march_many

    def wall(fn, reps=2):
        float(fn(o, d)[1])
        t0 = _time.perf_counter()
        for _ in range(reps):
            float(fn(o, d)[1])
        return (_time.perf_counter() - t0) / reps

    w1 = wall(make(inner[0]))
    w2 = wall(make(inner[1]))
    dt = max((w2 - w1) / (inner[1] - inner[0]), 1e-9)
    n_rays = width * height
    return {"mrays_per_sec": n_rays / dt / 1e6, "seconds_per_launch": dt}


def bench_fused_train(res=64, samples=128, batch=32768) -> dict:
    """Train-step throughput THROUGH the fused kernel (custom-VJP
    backward, pallas_fused2) vs the unfused XLA path — the tcnn-fused
    training capability (reference main.cu:781)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tnerf.cameras import Rays
    from tnerf.config import Config
    from tnerf.data.procedural import analytic_field
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.grid.occupancy import cell_centers
    from tnerf.render.grid_renderer import make_grid_renderer
    from tnerf.render.pallas_fused2 import make_fused_pipeline_renderer_v2

    cfg = Config().apply_overrides([
        f"grid.resolution={res}", f"sampler.samples_per_ray={samples}",
        "sampler.near=2.0", "sampler.far=5.5", "scene.scene_scale=1.0",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = jax.device_put(field.init(jax.random.PRNGKey(0)))
    _, sigma = analytic_field(cell_centers(cfg.grid).reshape(-1, 3))
    occ = jnp.asarray((sigma > 0.5).reshape(res, res, res))

    (o, d, v), = _camera_ray_variants(800, 800, n_variants=1)
    n = 800 * 800
    mid = max(0, n // 2 - batch // 2)
    o, d, v = o[mid:mid + batch], d[mid:mid + batch], v[mid:mid + batch]
    gt = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, 3)).astype(np.float32))
    opt = optax.adam(1e-3)
    ost = jax.device_put(opt.init(params))

    rend_f = make_fused_pipeline_renderer_v2(cfg.field_, cfg.grid, cfg.sampler, cfg.render)
    rend_x = make_grid_renderer(field, cfg.grid, cfg.sampler, cfg.render,
                                strategy="march", compact=False)

    def mk(rend):
        def f(o2):
            rays = Rays(origins=o2, directions=d, viewdirs_tp=v)

            def loss_fn(p):
                return jnp.mean((rend(p, rays, None, occ).rgb - gt) ** 2)

            l, g = jax.value_and_grad(loss_fn)(params)
            up, _ = opt.update(g, ost)
            return l + sum(jnp.sum(jnp.abs(u)) for u in jax.tree.leaves(up)) * 1e-12
        return f

    # Packed-ray training (fused_train_rpc=2 + S=64 over the tightened
    # span — the flagship fused-gate quadrature): 2 rays share each
    # 128-lane chunk so no MLP lanes are masked off.
    cfg_p = cfg.apply_overrides([
        "sampler.samples_per_ray=64", "render.fused_train_rpc=2",
    ])
    rend_p = make_fused_pipeline_renderer_v2(
        cfg_p.field_, cfg_p.grid, cfg_p.sampler, cfg_p.render, rpc=2,
        tighten=cfg_p.render.fused_tighten,
    )

    t_f = _diff_timeit(mk(rend_f), o, inner=(2, 6))
    t_x = _diff_timeit(mk(rend_x), o, inner=(2, 6))
    t_p = _diff_timeit(mk(rend_p), o, inner=(2, 6))
    flops = _field_fwd_flops(cfg.field_)
    return {
        "fused_train_krays_per_sec": batch / t_f / 1e3,
        "xla_train_krays_per_sec": batch / t_x / 1e3,
        "fused_train_speedup": t_x / t_f,
        "fused_train_rpc2_s64_krays_per_sec": batch / t_p / 1e3,
        # dense batch x S samples, fwd+bwd counted as 3x forward
        "fused_train_mfu": _mfu(batch * samples / t_f, flops, train=True),
        "xla_train_mfu": _mfu(batch * samples / t_x, flops, train=True),
        "fused_train_rpc2_s64_mfu": _mfu(batch * 64 / t_p, flops, train=True),
    }


def bench_hashgrid_train(res=64, samples=128, batch=8192, log2T=14) -> dict:
    """Instant-NGP hash-grid train-step throughput: the MXU matmul-gather
    encoding (tnerf/fields/hashgrid.py:apply_hashgrid_onehot) vs the XLA
    gather formulation — the tcnn HashGrid role (reference main.cu:35-69)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tnerf.cameras import Rays
    from tnerf.config import Config
    from tnerf.data.procedural import analytic_field
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.grid.occupancy import cell_centers
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        f"grid.resolution={res}", f"sampler.samples_per_ray={samples}",
        "sampler.near=2.0", "sampler.far=5.5", "scene.scene_scale=1.0",
        "field_.encoding=hashgrid", f"field_.hash_log2_table_size={log2T}",
        # the hashgrid gate's train-time mask semantics: pooled tighten,
        # FINE per-sample mask (the default pooled mask would pass ~3x
        # more samples into the encoding and skew the comparison)
        "sampler.tighten_res=32", "sampler.occupancy_mask_res=0",
    ])
    _, sigma = analytic_field(cell_centers(cfg.grid).reshape(-1, 3))
    occ = jnp.asarray((sigma > 0.5).reshape(res, res, res))

    (o, d, v), = _camera_ray_variants(800, 800, n_variants=1)
    n = 800 * 800
    mid = max(0, n // 2 - batch // 2)
    o, d, v = o[mid:mid + batch], d[mid:mid + batch], v[mid:mid + batch]
    gt = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, 3)).astype(np.float32))
    opt = optax.adam(1e-3)

    def step_time(mode, compact):
        c2 = cfg.apply_overrides([f"field_.hash_gather_mode={mode}"])
        field = NeRFField(c2.field_, c2.grid, arch="twobranch")
        params = jax.device_put(field.init(jax.random.PRNGKey(0)))
        ost = jax.device_put(opt.init(params))
        rend = make_grid_renderer(
            field, c2.grid, c2.sampler, c2.render, strategy="march",
            compact=compact, compact_capacity=batch * samples // 2,
        )

        def f(o2):
            rays = Rays(origins=o2, directions=d, viewdirs_tp=v)

            def loss_fn(p):
                return jnp.mean((rend(p, rays, None, occ).rgb - gt) ** 2)

            l, g = jax.value_and_grad(loss_fn)(params)
            up, _ = opt.update(g, ost)
            return l + sum(jnp.sum(jnp.abs(u)) for u in jax.tree.leaves(up)) * 1e-12

        return _diff_timeit(f, o, inner=(2, 5))

    # The onehot-vs-gather comparison is only fair if the compaction
    # capacity holds every occupied sample (overflow silently drops work
    # from BOTH timings, but asymmetrically skews the encoding cost):
    # measure the occupied-sample count of this exact workload.
    from tnerf.grid.traversal import (
        make_coarse_occupancy, march_samples_t, occupancy_lookup, ray_aabb,
        tightened_range,
    )
    from tnerf.sampling import sample_positions

    te, tx = ray_aabb(o, d, cfg.grid.aabb_min, cfg.grid.aabb_max)
    te = jnp.maximum(te, cfg.sampler.near)
    tx = jnp.maximum(tx, te)
    if cfg.sampler.tighten:
        # Mirror the timed renderer's quadrature: it tightens on the
        # tighten_res POOLED grid (kernel path), not the fine grid —
        # sample positions (and thus the occupied count) differ.
        t_res = min(cfg.sampler.tighten_res or res, res)
        occ_t = occ if t_res == res else make_coarse_occupancy(occ, res // t_res)
        te, tx = tightened_range(o, d, te, tx, occ_t, cfg.grid,
                                 probes=cfg.sampler.tighten_probes)
    t, _ = march_samples_t(te, tx, samples)
    # Per-sample mask: fine lookup (occupancy_mask_res=0 -> res) at the
    # pooled-tightened positions, matching the renderer's refine stage.
    smask = (tx[:, None] > te[:, None]) & occupancy_lookup(
        sample_positions(o, d, t), occ, cfg.grid
    )
    n_occ = int(jnp.sum(smask))
    capacity = batch * samples // 2
    overflow = max(0, n_occ - capacity) / max(n_occ, 1)
    if overflow > 0:
        print(f"WARNING: hashgrid bench compaction overflow: {n_occ} occupied "
              f"samples > capacity {capacity} ({overflow:.1%} dropped)")

    t_onehot = step_time("onehot", True)
    t_gather = step_time("gather", True)
    return {
        "hashgrid_train_krays_per_sec": batch / t_onehot / 1e3,
        "hashgrid_gather_train_krays_per_sec": batch / t_gather / 1e3,
        "hashgrid_onehot_speedup": t_gather / t_onehot,
        "hashgrid_compact_overflow_frac": overflow,
        # field evals at the compaction capacity (static shape), 3x fwd
        "hashgrid_train_mfu": _mfu(
            capacity / t_onehot, _field_fwd_flops(cfg.field_), train=True
        ),
    }


def bench_fused_render(width=800, height=800, res=64, samples=128,
                       ckpt_run="runs/hard_r3_fused_rpc2") -> dict:
    """Fused Pallas kernel (v2, pallas_fused2) render throughput against
    the TRAINED gate checkpoint + EMA occupancy when committed (analytic
    fallback) — see bench_render's ckpt_run note."""
    import jax
    import jax.numpy as jnp

    from tnerf.cameras import Rays
    from tnerf.config import Config
    from tnerf.data.procedural import analytic_field
    from tnerf.grid.occupancy import cell_centers
    from tnerf.render.pallas_fused2 import make_fused_pipeline_renderer_v2

    import os

    gate_cfg = "configs/procedural_hard_fused.json"
    base = (
        Config.from_json_file(gate_cfg)
        if (ckpt_run and os.path.exists(gate_cfg))
        else Config()
    )
    cfg = base.apply_overrides([
        f"grid.resolution={res}", f"sampler.samples_per_ray={samples}",
        "sampler.near=2.0", "sampler.far=5.5",
    ])
    from tnerf.fields.nerf_field import NeRFField

    field = NeRFField(cfg.field_, cfg.grid)
    params = jax.device_put(field.init(jax.random.PRNGKey(0)))
    tparams, occ_t, trained = _restore_gate(field, cfg, ckpt_run)
    if trained:
        params, occ3 = jax.device_put(tparams), jnp.asarray(occ_t)
    else:
        _, sigma = analytic_field(cell_centers(cfg.grid).reshape(-1, 3))
        occ3 = jnp.asarray((sigma > 0.5).reshape(res, res, res))

    (o, d, v), = _camera_ray_variants(width, height, n_variants=1)
    n = width * height
    n_chunks = -(-n // 32768)
    chunk = n // n_chunks
    # Strided chunk: the mix render_image's interleaving feeds each chunk
    # (required for honest ray-compaction numbers).
    o, d, v = o[::n_chunks][:chunk], d[::n_chunks][:chunk], v[::n_chunks][:chunk]

    mfus = {}

    def fps_of(rend, tier=None, s_pad=None, frac=None, rpc=1):
        """(mrays, fps_median, fps_lo, fps_hi) under the protocol of
        record (_diff_timeit_spread) — BENCH rows and README numbers
        come from the same code path so they cannot disagree.  When
        tier/s_pad are given, records the tier's MFU from the kernel's
        static scheduled shape (ray-compaction capacity x S_pad lanes;
        chunk-skip makes this a mild upper bound on issued work)."""
        def chunk_scalar(o2):
            rays = Rays(origins=o2, directions=d, viewdirs_tp=v)
            return rend(params, rays, None, occ3).rgb.sum()

        dt_med, dt_min, dt_max = _diff_timeit_spread(chunk_scalar, o)
        if tier is not None and s_pad is not None:
            unit = 16 * rpc  # b_tile=16 in every timed tier
            cap = (
                chunk if frac is None
                else -(-max(1, int(chunk * frac)) // unit) * unit
            )
            mfus[f"fused_{tier}_mfu"] = _mfu(
                cap * s_pad / dt_med,
                _mlp_fwd_flops(128, cfg.field_.hidden_layers + 1),
            )
        return (
            chunk / dt_med / 1e6,
            1.0 / (dt_med * n_chunks),
            1.0 / (dt_max * n_chunks),
            1.0 / (dt_min * n_chunks),
        )

    # Fast config (matches the hard_r3_fused_rpc2 gate quadrature: S=64
    # exact, rpc=2, tighten, ray compaction at the trained-occupancy
    # capacity): same-checkpoint PSNR is within 0.034 dB of the march
    # render (docs/ROUND3.md).
    cfg_fast = cfg.apply_overrides([
        "sampler.samples_per_ray=64", "render.ray_compact_fraction=0.75",
    ])
    mrays_fast, fps_fast, fast_lo, fast_hi = fps_of(make_fused_pipeline_renderer_v2(
        cfg_fast.field_, cfg_fast.grid, cfg_fast.sampler, cfg_fast.render,
        rpc=2, tighten=True, b_tile=16,  # measured fastest (5.3 vs 5.2 fps @32)
        ray_compact=True,
    ), tier="render", s_pad=64, frac=0.75, rpc=2)
    mrays_hq, fps_hq, _, _ = fps_of(make_fused_pipeline_renderer_v2(
        cfg.field_, cfg.grid, cfg.sampler, cfg.render, tighten=True,
    ), tier="hq", s_pad=samples, rpc=1)
    # Turbo tier (rpc=4, S=32, trained at its own quadrature —
    # runs/hard_r3_fused_rpc4: 36.88 dB test / min 35.0; march render of
    # the same checkpoint 37.69 dB, so the tier is 0.8 dB off parity and
    # stays optional).  Timed against its own trained checkpoint.
    fps_turbo = turbo_lo = turbo_hi = None
    if os.path.exists("runs/hard_r3_fused_rpc4/checkpoints"):
        tparams4, occ4, trained4 = _restore_gate(
            field, cfg, "runs/hard_r3_fused_rpc4"
        )
        if trained4:
            params, occ3 = jax.device_put(tparams4), jnp.asarray(occ4)
            cfg_turbo = cfg.apply_overrides([
                "sampler.samples_per_ray=32", "render.ray_compact_fraction=0.75",
            ])
            _, fps_turbo, turbo_lo, turbo_hi = fps_of(make_fused_pipeline_renderer_v2(
                cfg_turbo.field_, cfg_turbo.grid, cfg_turbo.sampler,
                cfg_turbo.render, rpc=4, tighten=True, b_tile=16,
                ray_compact=True,
            ), tier="turbo", s_pad=32, frac=0.75, rpc=4)
    # CDF tier (rpc=4, S=32, occupancy-CDF placement in the tmode
    # kernel — trained at its own quadrature): the reduced budget
    # concentrates on occupied bins, recovering the quality the turbo
    # tier's uniform S=32 loses.  Timed against its own trained
    # checkpoint; prefers the P=32 gate (identical quality to P=64 at
    # lower placement cost — 37.75 vs 37.72 dB, parity 0.253 vs 0.317).
    fps_cdf = cdf_lo = cdf_hi = None
    cdf_run, cdf_bins = (
        ("runs/hard_r4_fused_cdf_p32", 32)
        if os.path.exists("runs/hard_r4_fused_cdf_p32/checkpoints")
        else ("runs/hard_r4_fused_cdf", 64)
    )
    if os.path.exists(os.path.join(cdf_run, "checkpoints")):
        tparamsc, occc, trainedc = _restore_gate(field, cfg, cdf_run)
        if trainedc:
            params, occ3 = jax.device_put(tparamsc), jnp.asarray(occc)
            cfg_cdf = cfg.apply_overrides([
                # 0.70: right-sized to the measured 0.6525 keep fraction
                # at the 32^3 kernel pooling +0.05 margin — render-
                # identical to 0.75 (runs/cdf_tier_tune.json; parity
                # artifact render_parity_tuned.json, same PSNR to 4dp)
                "sampler.samples_per_ray=32", "render.ray_compact_fraction=0.7",
                "sampler.placement=occupancy_cdf",
                f"sampler.cdf_bins={cdf_bins}",
            ])
            _, fps_cdf, cdf_lo, cdf_hi = fps_of(make_fused_pipeline_renderer_v2(
                cfg_cdf.field_, cfg_cdf.grid, cfg_cdf.sampler,
                cfg_cdf.render, rpc=4, tighten=True, b_tile=16,
                ray_compact=True,
            ), tier="cdf", s_pad=32, frac=0.70, rpc=4)
    # Flagship quadrature + CDF (rpc=2, S=64, occupancy-CDF placement —
    # runs/hard_r4_fused_cdf2, 38.96 dB vs 38.24 uniform): is the better
    # quality free at render time too?
    fps_cdf2 = cdf2_lo = cdf2_hi = None
    if os.path.exists("runs/hard_r4_fused_cdf2/checkpoints"):
        tparams2, occ2, trained2 = _restore_gate(
            field, cfg, "runs/hard_r4_fused_cdf2"
        )
        if trained2:
            params, occ3 = jax.device_put(tparams2), jnp.asarray(occ2)
            cfg_cdf2 = cfg.apply_overrides([
                "sampler.samples_per_ray=64", "render.ray_compact_fraction=0.75",
                "sampler.placement=occupancy_cdf", "sampler.cdf_bins=64",
            ])
            _, fps_cdf2, cdf2_lo, cdf2_hi = fps_of(make_fused_pipeline_renderer_v2(
                cfg_cdf2.field_, cfg_cdf2.grid, cfg_cdf2.sampler,
                cfg_cdf2.render, rpc=2, tighten=True, b_tile=16,
                ray_compact=True,
            ), tier="cdf2", s_pad=64, frac=0.75, rpc=2)
    is800 = (width, height) == (800, 800)
    spread = lambda lo, hi: (
        [round(lo, 2), round(hi, 2)] if is800 and lo is not None else None
    )
    return {
        "fused_mrays_per_sec": mrays_fast,
        "fused_fps_800x800": fps_fast if is800 else None,
        "fused_fps_800x800_spread": spread(fast_lo, fast_hi),
        "fused_hq_mrays_per_sec": mrays_hq,
        "fused_hq_fps_800x800": fps_hq if is800 else None,
        "fused_turbo_fps_800x800": fps_turbo if is800 else None,
        "fused_turbo_fps_800x800_spread": spread(turbo_lo, turbo_hi),
        "fused_cdf_fps_800x800": fps_cdf if is800 else None,
        "fused_cdf_fps_800x800_spread": spread(cdf_lo, cdf_hi),
        "fused_cdf2_fps_800x800": fps_cdf2 if is800 else None,
        "fused_cdf2_fps_800x800_spread": spread(cdf2_lo, cdf2_hi),
        **mfus,
    }


def bench_baked_render(width=800, height=800, bake_res=320,
                       ckpt_run=None,
                       config_file=None,
                       mode="trilinear_brick") -> dict:
    """Baked-field fast render (tnerf/render/baked.py): bake the quality
    gate's trained hashgrid into a dense [bake_res^3,4] grid on the fly
    (~seconds), then time the lookup-only render at the gate's CDF
    quadrature (S=24, bins 64, pooled 32^3 fold kernel, ray compaction).
    The quality side lives in the committed baked_parity.json artifact
    (cli bake --eval) — this row is the fps.  Role: the interactive
    render intent of reference main.cu:19-21 / optixPrograms.cu:43-116."""
    import os

    import jax
    import jax.numpy as jnp

    from tnerf.cameras import Rays
    from tnerf.config import Config
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.render.baked import bake_field, make_baked_renderer

    if ckpt_run is None:
        # prefer the DIFFUSE gate (its bake is view-exact — the fps row
        # then matches the committed parity artifact); fall back to the
        # view-dependent champion for older checkouts
        for cand in ("runs/hard_r5_hashgrid_diffuse",
                     "runs/hard_r3_hashgrid_cdf"):
            if os.path.exists(os.path.join(cand, "checkpoints")):
                ckpt_run, config_file = cand, f"{cand}/config.json"
                break
        else:
            return {}
    if not os.path.exists(os.path.join(ckpt_run, "checkpoints")):
        return {}
    cfg = Config.from_json_file(config_file).apply_overrides([
        "sampler.samples_per_ray=24", "sampler.placement=occupancy_cdf",
        "sampler.cdf_bins=64", "sampler.tighten_res=32",
        "sampler.occupancy_mask_res=32",
        "render.ray_compact=true", "render.ray_compact_fraction=0.65",
        "render.compact=false",
    ])
    arch = (
        "twobranch" if cfg.field_.encoding in ("hashgrid", "triplane", "cp")
        else "fused5d"
    )
    field = NeRFField(cfg.field_, cfg.grid, arch=arch)
    tparams, occ, trained = _restore_gate(field, cfg, ckpt_run)
    if not trained:
        return {}
    occ3 = jnp.asarray(occ)
    import time as _time

    t0 = _time.perf_counter()
    table = bake_field(
        field, jax.device_put(tparams), cfg.grid, bake_res=bake_res,
        occupancy=occ3,
    )
    table.block_until_ready()
    bake_s = _time.perf_counter() - t0
    rend = make_baked_renderer(
        table, bake_res, cfg.grid, cfg.sampler, cfg.render, mode=mode
    )

    (o, d, v), = _camera_ray_variants(width, height, n_variants=1)
    n = width * height
    n_chunks = -(-n // 32768)
    chunk = n // n_chunks
    o, d, v = o[::n_chunks][:chunk], d[::n_chunks][:chunk], v[::n_chunks][:chunk]

    def chunk_scalar(o2, table):
        rays = Rays(origins=o2, directions=d, viewdirs_tp=v)
        return rend({"table": table}, rays, None, occ3).rgb.sum()

    dt_med, dt_min, dt_max = _diff_timeit_spread(
        chunk_scalar, o, args=(rend.params["table"],)
    )
    is800 = (width, height) == (800, 800)
    return {
        "baked_mrays_per_sec": chunk / dt_med / 1e6,
        "baked_fps_800x800": (
            1.0 / (dt_med * n_chunks) if is800 else None
        ),
        "baked_fps_800x800_spread": (
            [round(1.0 / (dt_max * n_chunks), 2),
             round(1.0 / (dt_min * n_chunks), 2)] if is800 else None
        ),
        "baked_bake_seconds": round(bake_s, 1),
        "baked_res": bake_res,
    }


def gate_metrics() -> dict:
    """Quality numbers of record from the committed gate runs (runs/*/
    metrics.jsonl): mean AND min test-view PSNR — the acceptance asserts
    the min too, so a regressing view can't hide behind the mean."""
    import os

    out = {}
    gates = {
        "gate_march": "runs/hard_r3_march",
        "gate_fused": "runs/hard_r3_fused_rpc2",
        "gate_hashgrid": "runs/hard_r3_hashgrid",
        "gate_fused_turbo": "runs/hard_r3_fused_rpc4",
        # queued TPU experiments (present once the tunnel-outage queue
        # drains; absent dirs are skipped):
        "gate_hashgrid_k6": "runs/hard_r3_hashgrid_k6",
        "gate_hashgrid_cdf": "runs/hard_r3_hashgrid_cdf",
        "gate_march_cdf": "runs/hard_r3_march_cdf",
        "gate_march_dcdf": "runs/hard_r3_march_dcdf",
        "gate_hashgrid_dcdf": "runs/hard_r3_hashgrid_dcdf",
        "gate_hashgrid_best": "runs/hard_r3_hashgrid_best",
        "gate_triplane": "runs/hard_r3_triplane",
        "gate_triplane_prog": "runs/hard_r3_triplane_prog",
        # round-4: fused turbo quadrature + occupancy-CDF placement
        "gate_fused_cdf": "runs/hard_r4_fused_cdf",
        "gate_fused_cdf_p32": "runs/hard_r4_fused_cdf_p32",
        # round-4: flagship quadrature (rpc=2 S=64) + CDF placement
        "gate_fused_cdf2": "runs/hard_r4_fused_cdf2",
        # round-4 coverage gates: the reference's own pipeline shape
        # (grid_intervals 8^3 / 32 per interval) + 16^3 variant, and
        # the TensoRF-CP family at rank 64
        "gate_intervals": "runs/hard_r4_intervals",
        "gate_intervals16": "runs/hard_r4_intervals16",
        "gate_cp": "runs/hard_r4_cp",
        # round-5: speed-tier gate retrained end-to-end with the 32^3
        # in-kernel mask, and the march pipeline at the reference's own
        # 8^3 grid (the reference_parity measured row)
        "gate_fused_cdf_p32_r5": "runs/hard_r5_fused_cdf_p32",
        "gate_march8": "runs/hard_r5_march8",
        # round-5: diffuse view branch (sh_degree=1) on the hashgrid-CDF
        # champion config — the quality best AND the view-exact bake
        "gate_hashgrid_diffuse": "runs/hard_r5_hashgrid_diffuse",
    }
    here = os.path.dirname(os.path.abspath(__file__))
    for name, rel in gates.items():
        path = os.path.join(here, rel, "metrics.jsonl")
        if not os.path.exists(path):
            continue
        last = {}
        rates = []
        with open(path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "psnr_test" in rec:
                    last = rec
                if "rays_per_sec" in rec:
                    rates.append(float(rec["rays_per_sec"]))
        if last:
            out[f"{name}_psnr_test"] = round(last["psnr_test"], 2)
            if "psnr_test_min" in last:
                out[f"{name}_psnr_test_min"] = round(last["psnr_test_min"], 2)
        if rates:
            # REAL-loop training throughput of record: median of the
            # second half of the run's logged window rates (skips the
            # compile-dominated early windows; async dispatch makes each
            # sample a multi-step window average, not one-step timing)
            tail = sorted(rates[len(rates) // 2:])
            out[f"{name}_loop_krays_per_sec"] = round(
                tail[len(tail) // 2] / 1e3, 1
            )

    # Same-checkpoint march-vs-fused parity (north-star clause): the
    # committed artifact tools/render_parity.py writes — full test split
    # at gate resolution through BOTH renderers.
    ppath = os.path.join(here, "runs/hard_r3_fused_rpc2/render_parity.json")
    if os.path.exists(ppath):
        try:
            with open(ppath) as fh:
                par = json.load(fh)
            out["fused_march_parity_db"] = par["parity_db"]
            out["fused_march_parity_march_psnr"] = par["march"]["psnr_test"]
        except (json.JSONDecodeError, KeyError):
            pass

    # Round-4 fused-CDF tier parity artifacts: same-quadrature kernel
    # parity AND the stricter vs-uniform-S=64 march render of the same
    # checkpoint (tools/tpu_queue_r4b.sh stages 2-3).
    for key, rel in (
        ("fused_cdf_parity_db", "runs/hard_r4_fused_cdf/render_parity.json"),
        ("fused_cdf_parity_vs_s64_db",
         "runs/hard_r4_fused_cdf/render_parity_vs_s64.json"),
        ("fused_cdf2_parity_db",
         "runs/hard_r4_fused_cdf2/render_parity.json"),
        ("fused_cdf_p32_parity_db",
         "runs/hard_r4_fused_cdf_p32/render_parity.json"),
        ("fused_turbo_parity_db",
         "runs/hard_r3_fused_rpc4/render_parity.json"),
        # round-5: retrained 32^3-mask speed tier + CP compaction
        # exactness (gate render vs dense march, same checkpoint)
        ("fused_cdf_p32_r5_parity_db",
         "runs/hard_r5_fused_cdf_p32/render_parity.json"),
        ("cp_compaction_parity_db",
         "runs/hard_r4_cp/render_parity_compaction.json"),
    ):
        qpath = os.path.join(here, rel)
        if os.path.exists(qpath):
            try:
                with open(qpath) as fh:
                    out[key] = json.load(fh)["parity_db"]
            except (json.JSONDecodeError, KeyError):
                pass

    # Multi-scene suite rehearsal (cli suite over runs/suite_rehearsal,
    # BASELINE config 4): per-scene final eval from each run's metrics.
    suite_psnrs = []
    for scene in ("prims", "rings", "layers"):
        mpath = os.path.join(
            here, "runs/suite_rehearsal", scene, "metrics.jsonl"
        )
        if not os.path.exists(mpath):
            continue
        last = {}
        with open(mpath) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "psnr_test" in rec:
                    last = rec
        if last:
            out[f"suite_{scene}_psnr_test"] = round(last["psnr_test"], 2)
            suite_psnrs.append(last["psnr_test"])
    if suite_psnrs:
        out["suite_mean_psnr_test"] = round(
            sum(suite_psnrs) / len(suite_psnrs), 2
        )

    # Baked-field fast-render parity artifacts (cli bake --eval): baked
    # lookup render vs the direct march render of the same checkpoint.
    for tag, rel in (
        ("hashgrid_cdf", "runs/hard_r3_hashgrid_cdf/baked_parity.json"),
        ("triplane", "runs/hard_r3_triplane_prog/baked_parity.json"),
        ("cp", "runs/hard_r4_cp/baked_parity.json"),
        ("diffuse", "runs/hard_r5_hashgrid_diffuse/baked_parity.json"),
    ):
        bpath = os.path.join(here, rel)
        if os.path.exists(bpath):
            try:
                with open(bpath) as fh:
                    b = json.load(fh)
                out[f"baked_{tag}_parity_db"] = b["parity_db"]
                out[f"baked_{tag}_psnr_test"] = b["baked"]["psnr_test"]
            except (json.JSONDecodeError, KeyError):
                pass

    # COLMAP at-scale rehearsal (tools/colmap_rehearsal.py): loader rate
    # through the real sparse-model reader + the trained NDC quality.
    cpath = os.path.join(here, "runs/colmap_rehearsal/summary.json")
    if os.path.exists(cpath):
        try:
            with open(cpath) as fh:
                cm = json.load(fh)
            n_views = sum(v["views"] for v in cm["loader"].values()
                          if isinstance(v, dict) and "views" in v)
            out["loader_colmap_images_per_sec"] = round(
                n_views / cm["loader"]["seconds"], 1
            )
            out["colmap_ndc_psnr_test"] = round(cm["train"]["psnr_test"], 2)
        except (json.JSONDecodeError, KeyError, ZeroDivisionError):
            pass

    # Loader throughput from the 800x800 dress rehearsal (real reader +
    # native threaded PNG decode; tools/dress_rehearsal.py).
    lpath = os.path.join(here, "runs/dress_rehearsal/loader_bench.json")
    if os.path.exists(lpath):
        try:
            with open(lpath) as fh:
                lb = json.load(fh)
            for scene_name, rec in lb.items():
                if isinstance(rec, dict) and "images_per_sec" in rec:
                    out[f"loader_{scene_name}_images_per_sec"] = rec[
                        "images_per_sec"
                    ]
        except json.JSONDecodeError:
            pass
    return out


def bench_mesh_extract(res: int = 128):
    """Isosurface extraction throughput (cli mesh role): marching
    tetrahedra over a (res+1)^3 analytic sphere sampling — pure host
    numpy, so this row measures the export tool, not the chip."""
    import numpy as _np

    from tnerf.grid.marching import marching_tetrahedra

    n = res + 1
    ax = _np.linspace(-1.0, 1.0, n, dtype=_np.float32)
    x, y, z = _np.meshgrid(ax, ax, ax, indexing="ij")
    vals = 0.6 - _np.sqrt(x * x + y * y + z * z)
    # steady-state: the first call pays allocator/page-fault warmup
    # (~9x at this size), so time the second
    marching_tetrahedra(vals, 0.0)
    t0 = time.perf_counter()
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(-1, -1, -1), spacing=(ax[1] - ax[0],) * 3
    )
    dt = time.perf_counter() - t0
    return {
        "mesh_extract_mcells_per_sec": (res ** 3) / dt / 1e6,
        "mesh_extract_faces": float(len(faces)),
    }


def _backend_reachable(timeout_s: int = 300) -> bool:
    """jax.devices() BLOCKS indefinitely when the remote accelerator
    tunnel is down (observed >9 min in a futex wait, no error) — probe
    it in a subprocess with a hard timeout so a dead tunnel yields a
    JSON error line instead of hanging the driver's bench capture."""
    import subprocess
    import sys as _sys

    try:
        r = subprocess.run(
            [_sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import sys
    import traceback

    import jax

    if not _backend_reachable():
        print(json.dumps({
            "metric": "ray_march_Mrays_per_sec_800x800_8^3grid",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "extra": {
                "error": "accelerator backend unreachable "
                "(jax.devices() probe timed out; tunnel down)",
                **gate_metrics(),
            },
        }))
        return

    device = jax.devices()[0].device_kind
    extra = {"device": device}
    extra.update(gate_metrics())

    def attempt(fn, tag=None, **kw):
        """Run one sub-benchmark; a failure (e.g. a transient remote-compile
        hiccup) records an error string instead of killing the whole run —
        the headline line must always be emitted.  `tag` disambiguates
        the error key when the same fn backs several rows (bench_render
        has ~8 call sites; colliding keys silently overwrite)."""
        try:
            return fn(**kw)
        except Exception as e:  # noqa: BLE001 — deliberately broad
            traceback.print_exc(file=sys.stderr)
            key = tag or kw.get("ckpt_run") or fn.__name__
            extra[f"error_{key}"] = f"{type(e).__name__}: {e}"[:200]
            return None

    march8 = attempt(bench_ray_march, res=8)
    march128 = attempt(bench_march_pallas, res=128)          # Pallas DDA kernel
    march128_scan = attempt(bench_ray_march, res=128, inner=(2, 8))  # lax.scan walk
    # Flagship march config (matches runs/hard_r3_march gate): pooled
    # Pallas tighten+mask kernel + eval-time ray compaction, S=96.
    # Flagship march render: trained gate checkpoint + EMA occupancy
    # (the analytic grid keeps ~0.45 of rays pooled at 16^3, the trained
    # grid 0.65-0.70 — timing against the thin grid overstated fps and
    # the old 0.5 capacity would background-drop content rays).
    render = attempt(
        bench_render, samples=96, strided=True,
        config_file="configs/procedural_hard_30db.json",
        ckpt_run="runs/hard_r3_march",
        overrides=(
            "sampler.tighten_res=16", "sampler.occupancy_mask_res=16",
            "render.ray_compact=true", "render.ray_compact_fraction=0.75",
        ),
    )
    # Round-2 configuration (fine mask + XLA tighten, S=128) for
    # comparability with BENCH_r01/r02 (defaults moved on in round 3, so
    # pin the old knobs explicitly).
    render_fine = attempt(
        bench_render,
        overrides=("sampler.tighten_res=0", "sampler.occupancy_mask_res=0"),
    )
    # Hash-grid render (the tcnn-HashGrid role at eval): MXU one-hot
    # encode + ray compaction + fine-mask sample compaction — the
    # runs/hard_r3_hashgrid gate configuration (41.45 dB), capacities
    # sized to the measured occupancies (no silent drops; see
    # docs/KERNEL_NOTES.md round-3 addendum).
    hg_render = attempt(
        bench_render, samples=48, res=128, strided=True, compact=True,
        scene_field="hard",
        config_file="configs/procedural_hard_hashgrid.json",
        ckpt_run="runs/hard_r3_hashgrid",
        overrides=(
            "field_.encoding=hashgrid", "field_.hash_levels=12",
            "sampler.tighten_res=32", "sampler.occupancy_mask_res=0",
            # capacities measured on the TRAINED gate occupancy (keep
            # 0.51-0.60 pooled at 32^3; fine samples 0.17-0.19 of kept)
            "render.ray_compact=true", "render.ray_compact_fraction=0.65",
            "render.compact_fraction=0.25",
        ),
    )
    # Occupancy-CDF placement variant (runs/hard_r3_hashgrid_cdf, the
    # queued TPU experiment): HALF the sample budget (S=24) importance-
    # placed on fine-grid occupied bins; knobs mirror the training
    # overrides (quadrature contract), capacity raised to the measured
    # ~0.95 occupied-sample fraction per kept ray.  Skipped until the
    # gate run exists.
    import os as _os

    hg_cdf_render = None
    if _os.path.exists("runs/hard_r3_hashgrid_cdf/checkpoints"):
        hg_cdf_render = attempt(
            bench_render, samples=24, res=128, strided=True, compact=True,
            scene_field="hard",
            config_file="configs/procedural_hard_hashgrid.json",
            ckpt_run="runs/hard_r3_hashgrid_cdf",
            overrides=(
                "field_.encoding=hashgrid", "field_.hash_levels=12",
                "sampler.placement=occupancy_cdf", "sampler.cdf_bins=64",
                "render.ray_compact=true",
                "render.ray_compact_fraction=0.65",
                "render.compact_fraction=0.95",
            ),
        )
    # Occupancy-CDF placement on the march gate (runs/hard_r3_march_cdf,
    # queued TPU experiment): S=48 importance-placed; with t_res==m_res
    # this render takes the CDF-FOLDED kernel path (one Pallas launch
    # yields tighten + bin weights + support; no XLA bin probes).
    march_cdf_render = None
    if _os.path.exists("runs/hard_r3_march_cdf/checkpoints"):
        march_cdf_render = attempt(
            # res must match the gate checkpoint's occupancy grid: the
            # march preset trains at 64^3 (hashgrid/triplane at 128^3)
            bench_render, samples=48, res=64, strided=True,
            scene_field="hard",
            config_file="configs/procedural_hard_30db.json",
            ckpt_run="runs/hard_r3_march_cdf",
            overrides=(
                "sampler.placement=occupancy_cdf", "sampler.cdf_bins=64",
                "sampler.samples_per_ray=48",
                "sampler.tighten_res=16", "sampler.occupancy_mask_res=16",
                "render.ray_compact=true",
                "render.ray_compact_fraction=0.75",
            ),
        )
    # Density-CDF placement variant (runs/hard_r3_march_dcdf, queued TPU
    # experiment): transmittance-weighted placement at S=48 on the march
    # gate config; the bin probes ride density_lookup_fast (one-hot
    # value matmuls).  Skipped until the gate run exists.
    march_dcdf_render = None
    if _os.path.exists("runs/hard_r3_march_dcdf/checkpoints"):
        march_dcdf_render = attempt(
            bench_render, samples=48, res=64, strided=True,
            scene_field="hard",
            config_file="configs/procedural_hard_30db.json",
            ckpt_run="runs/hard_r3_march_dcdf",
            overrides=(
                "sampler.placement=density_cdf", "sampler.cdf_bins=64",
                "sampler.tighten_res=16", "sampler.occupancy_mask_res=16",
                "render.ray_compact=true",
                "render.ray_compact_fraction=0.75",
            ),
        )
    # Triplane (TensoRF-style VM) render on its trained gate checkpoint
    # (runs/hard_r3_triplane, queued TPU experiment): R=128 planes on
    # the MXU one-hot path, same march/compaction shape as the hashgrid
    # row.  Skipped until the gate run exists.
    tri_render = None
    if _os.path.exists("runs/hard_r3_triplane/checkpoints"):
        tri_render = attempt(
            bench_render, samples=48, res=128, strided=True, compact=True,
            scene_field="hard",
            config_file="configs/procedural_hard_triplane.json",
            ckpt_run="runs/hard_r3_triplane",
            overrides=(
                "sampler.tighten_res=32", "sampler.occupancy_mask_res=0",
                "render.ray_compact=true", "render.ray_compact_fraction=0.65",
                "render.compact_fraction=0.25",
            ),
        )
    # CP family render (runs/hard_r4_cp, 41.58 dB gate): the lightest
    # TensoRF family — same march/compaction shape as triplane; fills
    # the configs/README measured-matrix CP render cell (r4 verdict
    # missing #4).  The gate's own config.json is the exact shape.
    cp_render = None
    if _os.path.exists("runs/hard_r4_cp/checkpoints"):
        cp_render = attempt(
            bench_render, samples=48, res=128, strided=True, compact=True,
            scene_field="hard",
            config_file="runs/hard_r4_cp/config.json",
            ckpt_run="runs/hard_r4_cp",
            overrides=(
                "render.ray_compact=true", "render.ray_compact_fraction=0.65",
                "render.compact_fraction=0.25",
            ),
        )
    # Reference-shape interval pipeline renders (runs/hard_r4_intervals*,
    # the reference's own execution shape — main.cu:394, sampler.h:4):
    # per-cell interval lists, 8^3 x 32/interval and 16^3 x 16/interval.
    iv_render = None
    if _os.path.exists("runs/hard_r4_intervals/checkpoints"):
        iv_render = attempt(
            bench_render, res=8, strided=True, strategy="intervals",
            scene_field="hard",
            config_file="runs/hard_r4_intervals/config.json",
            ckpt_run="runs/hard_r4_intervals",
        )
    iv16_render = None
    if _os.path.exists("runs/hard_r4_intervals16/checkpoints"):
        iv16_render = attempt(
            bench_render, res=16, strided=True, strategy="intervals",
            scene_field="hard",
            config_file="runs/hard_r4_intervals16/config.json",
            ckpt_run="runs/hard_r4_intervals16",
        )
    baked = attempt(bench_baked_render)
    fused = attempt(bench_fused_render)
    train = attempt(bench_fused_train)
    hg = attempt(bench_hashgrid_train)

    def put(src, key, out_key=None, digits=3):
        if src is not None and src.get(key) is not None:
            v = src[key]
            extra[out_key or key] = round(v, digits) if not isinstance(
                v, (list, tuple)) else list(v)

    put(march128, "mrays_per_sec", "march_128grid_mrays_per_sec", 2)
    put(march128_scan, "mrays_per_sec", "march_128grid_scan_mrays_per_sec", 2)
    put(render, "render_mrays_per_sec")
    put(render, "fps_800x800")
    put(render_fine, "render_mrays_per_sec", "render_finemask_mrays_per_sec")
    put(render_fine, "fps_800x800", "fps_800x800_finemask")
    put(hg_render, "render_mrays_per_sec", "hashgrid_render_mrays_per_sec")
    put(hg_render, "fps_800x800", "hashgrid_fps_800x800")
    put(hg_cdf_render, "render_mrays_per_sec", "hashgrid_cdf_render_mrays_per_sec")
    put(hg_cdf_render, "fps_800x800", "hashgrid_cdf_fps_800x800")
    put(tri_render, "render_mrays_per_sec", "triplane_render_mrays_per_sec")
    put(tri_render, "fps_800x800", "triplane_fps_800x800")
    put(march_cdf_render, "render_mrays_per_sec", "march_cdf_render_mrays_per_sec")
    put(march_cdf_render, "fps_800x800", "march_cdf_fps_800x800")
    put(march_dcdf_render, "render_mrays_per_sec", "march_dcdf_render_mrays_per_sec")
    put(march_dcdf_render, "fps_800x800", "march_dcdf_fps_800x800")
    put(cp_render, "render_mrays_per_sec", "cp_render_mrays_per_sec")
    put(cp_render, "fps_800x800", "cp_fps_800x800")
    put(cp_render, "mfu", "mfu_cp_render", 4)
    put(iv_render, "render_mrays_per_sec", "intervals8_render_mrays_per_sec")
    put(iv_render, "fps_800x800", "intervals8_fps_800x800")
    put(iv16_render, "render_mrays_per_sec", "intervals16_render_mrays_per_sec")
    put(iv16_render, "fps_800x800", "intervals16_fps_800x800")
    put(baked, "baked_mrays_per_sec")
    put(baked, "baked_fps_800x800")
    put(baked, "baked_fps_800x800_spread")
    put(baked, "baked_bake_seconds", digits=1)
    put(baked, "baked_res", digits=0)
    put(fused, "fused_mrays_per_sec", "fused_render_mrays_per_sec")
    put(fused, "fused_fps_800x800")
    put(fused, "fused_fps_800x800_spread")
    put(fused, "fused_hq_mrays_per_sec")
    put(fused, "fused_hq_fps_800x800")
    put(fused, "fused_turbo_fps_800x800")
    put(fused, "fused_turbo_fps_800x800_spread")
    put(fused, "fused_cdf_fps_800x800")
    put(fused, "fused_cdf_fps_800x800_spread")
    put(fused, "fused_cdf2_fps_800x800")
    put(fused, "fused_cdf2_fps_800x800_spread")
    put(train, "fused_train_krays_per_sec", digits=1)
    put(train, "xla_train_krays_per_sec", digits=1)
    put(train, "fused_train_speedup", digits=2)
    put(train, "fused_train_rpc2_s64_krays_per_sec", digits=1)
    put(hg, "hashgrid_train_krays_per_sec", digits=1)
    put(hg, "hashgrid_gather_train_krays_per_sec", digits=1)
    put(hg, "hashgrid_onehot_speedup", digits=2)
    # MFU rows (fraction of v5e bf16 peak; see the accounting block at
    # the top of this file for what "scheduled" means per row)
    put(train, "fused_train_mfu", "mfu_fused_train", 4)
    put(train, "xla_train_mfu", "mfu_xla_train", 4)
    put(train, "fused_train_rpc2_s64_mfu", "mfu_fused_train_rpc2_s64", 4)
    put(hg, "hashgrid_train_mfu", "mfu_hashgrid_train", 4)
    put(render, "mfu", "mfu_march_render", 4)
    put(hg_render, "mfu", "mfu_hashgrid_render", 4)
    put(hg_cdf_render, "mfu", "mfu_hashgrid_cdf_render", 4)
    put(tri_render, "mfu", "mfu_triplane_render", 4)
    put(march_cdf_render, "mfu", "mfu_march_cdf_render", 4)
    put(fused, "fused_render_mfu", "mfu_fused_render", 4)
    put(fused, "fused_hq_mfu", "mfu_fused_hq", 4)
    put(fused, "fused_turbo_mfu", "mfu_fused_turbo", 4)
    put(fused, "fused_cdf_mfu", "mfu_fused_cdf", 4)
    put(fused, "fused_cdf2_mfu", "mfu_fused_cdf2", 4)
    put(render, "occupancy_frac", "render_occupancy_frac", 4)
    if render is not None:
        extra["render_samples_per_ray"] = render["samples_per_ray"]
    put(march8, "seconds_per_launch", "march_seconds_per_launch", 6)
    mesh_x = attempt(bench_mesh_extract)
    put(mesh_x, "mesh_extract_mcells_per_sec", digits=2)
    put(mesh_x, "mesh_extract_faces", digits=0)

    value = round(march8["mrays_per_sec"], 2) if march8 else 0.0
    line = {
        "metric": "ray_march_Mrays_per_sec_800x800_8^3grid",
        "value": value,
        "unit": "Mrays/s",
        "vs_baseline": round(value / 100.0, 3),  # north star: 100 Mrays/s
        "extra": extra,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
