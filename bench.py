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


def _diff_timeit(scalar_fn, o, inner=(2, 10), reps=2):
    """Differential in-program timing: scalar_fn(o_perturbed) -> scalar is
    run `inner[i]` times inside one jit (lax.scan, serially-dependent
    carry); per-iteration time is the slope between the two walls.
    Returns seconds per iteration."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def many(o):
            def body(carry, _):
                s = scalar_fn(o + carry * 1e-4)
                f = s * 1e-3
                return f - jnp.floor(f), s
            carry, ss = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return ss.sum()
        return many

    def wall(fn):
        float(fn(o))  # compile + warm (+ value fetch)
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(o))
        return (time.perf_counter() - t0) / reps

    w1 = wall(make(inner[0]))
    w2 = wall(make(inner[1]))
    return max((w2 - w1) / (inner[1] - inner[0]), 1e-9)


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


def bench_render(width=800, height=800, res=64, samples=128) -> dict:
    """Full-pipeline render throughput (march + field + composite) with a
    realistic occupancy grid derived from the analytic procedural field."""
    import jax
    import jax.numpy as jnp

    from tnerf.cameras import Rays
    from tnerf.config import Config
    from tnerf.data.procedural import analytic_field
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.grid.occupancy import cell_centers
    from tnerf.render.grid_renderer import make_grid_renderer

    cfg = Config().apply_overrides([
        f"grid.resolution={res}",
        f"sampler.samples_per_ray={samples}",
        "sampler.near=2.0", "sampler.far=5.5",
        "scene.scene_scale=1.0",
    ])
    field = NeRFField(cfg.field_, cfg.grid)
    params = field.init(jax.random.PRNGKey(0))
    _, sigma = analytic_field(cell_centers(cfg.grid).reshape(-1, 3))
    occ = (sigma > 0.5).reshape(res, res, res)
    occ_frac = float(occ.mean())

    (o, d, v), = _camera_ray_variants(width, height, n_variants=1)
    chunk = 32768
    n = width * height
    mid = max(0, n // 2 - chunk // 2)  # center chunk: representative mix
    o, d, v = o[mid:mid + chunk], d[mid:mid + chunk], v[mid:mid + chunk]
    renderer = make_grid_renderer(
        field, cfg.grid, cfg.sampler, cfg.render,
        strategy="march", compact=False,
    )

    def chunk_scalar(o2):
        rays = Rays(origins=o2, directions=d, viewdirs_tp=v)
        return renderer(params, rays, None, occ).rgb.sum()

    dt_chunk = _diff_timeit(chunk_scalar, o)
    n_chunks = -(-n // chunk)
    dt = dt_chunk * n_chunks  # per 800x800 frame
    return {
        "render_mrays_per_sec": chunk / dt_chunk / 1e6,
        "fps_800x800": (1.0 / dt) if (width, height) == (800, 800) else None,
        "occupancy_frac": occ_frac,
        "samples_per_ray": samples,
        "field": cfg.field_.encoding,
    }


def bench_fused_render(width=800, height=800, res=64, samples=128) -> dict:
    """Fused Pallas kernel render throughput (march+encode+MLP+composite
    in one kernel, early termination + empty-tile skipping) with the
    realistic analytic-scene occupancy grid."""
    import jax
    import jax.numpy as jnp

    from tnerf.config import Config
    from tnerf.data.procedural import analytic_field
    from tnerf.fields.nerf_field import NeRFField
    from tnerf.grid.occupancy import cell_centers
    from tnerf.grid.traversal import occupancy_lookup, ray_aabb
    from tnerf.render.pallas_fused import make_fused_renderer, pack_rays
    from tnerf.sampling import sample_positions

    cfg = Config().apply_overrides([f"grid.resolution={res}"])
    field = NeRFField(cfg.field_, cfg.grid)
    params = jax.device_put(field.init(jax.random.PRNGKey(0)))
    _, sigma = analytic_field(cell_centers(cfg.grid).reshape(-1, 3))
    occ3 = (sigma > 0.5).reshape(res, res, res)

    (o, d, v), = _camera_ray_variants(width, height, n_variants=1)
    n = width * height
    chunk = 32768
    S = samples
    fused = make_fused_renderer(cfg.field_, cfg.grid, b_tile=128, sc=32)

    mid = max(0, n // 2 - chunk // 2)  # center chunk: representative mix
    o, d, v = o[mid:mid + chunk], d[mid:mid + chunk], v[mid:mid + chunk]

    def chunk_scalar(o2):
        te, tx = ray_aabb(o2, d, cfg.grid.aabb_min, cfg.grid.aabb_max)
        te = jnp.maximum(te, 0.05)
        tx = jnp.maximum(tx, te)
        dt = (tx - te) / S
        t = te[:, None] + (jnp.arange(S, dtype=jnp.float32) + 0.5) * dt[:, None]
        pts = sample_positions(o2, d, t)
        mask = ((tx > te)[:, None] & occupancy_lookup(pts, occ3, cfg.grid))
        out = fused(params, pack_rays(o2, d, v, te, dt), mask.astype(jnp.float32))
        return out[:, 3].sum()

    dt_chunk = _diff_timeit(chunk_scalar, o)
    n_chunks = -(-n // chunk)
    dt = dt_chunk * n_chunks
    return {
        "fused_mrays_per_sec": chunk / dt_chunk / 1e6,
        "fused_fps_800x800": (1.0 / dt) if (width, height) == (800, 800) else None,
    }


def main():
    import jax

    device = jax.devices()[0].device_kind
    march8 = bench_ray_march(res=8)
    march128 = bench_ray_march(res=128, inner=(2, 8))
    render = bench_render()
    fused = bench_fused_render()
    value = round(march8["mrays_per_sec"], 2)
    line = {
        "metric": "ray_march_Mrays_per_sec_800x800_8^3grid",
        "value": value,
        "unit": "Mrays/s",
        "vs_baseline": round(value / 100.0, 3),  # north star: 100 Mrays/s
        "extra": {
            "march_128grid_mrays_per_sec": round(march128["mrays_per_sec"], 2),
            "render_mrays_per_sec": round(render["render_mrays_per_sec"], 3),
            "fps_800x800": round(render["fps_800x800"], 3) if render["fps_800x800"] else None,
            "fused_render_mrays_per_sec": round(fused["fused_mrays_per_sec"], 3),
            "fused_fps_800x800": round(fused["fused_fps_800x800"], 3) if fused["fused_fps_800x800"] else None,
            "render_occupancy_frac": round(render["occupancy_frac"], 4),
            "render_samples_per_ray": render["samples_per_ray"],
            "march_seconds_per_launch": round(march8["seconds_per_launch"], 6),
            "device": device,
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
