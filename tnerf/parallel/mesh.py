"""Mesh construction + data-parallel training over rays.

The reference has no multi-device story at all — no NCCL/MPI, no
collectives, two unsynchronized CUDA streams as its only concurrency
(SURVEY §2.4).  The TPU framework's parallelism is the one natural to
NeRF: rays are i.i.d., so the ray batch is sharded across chips over a
1-D mesh ("data" axis), parameters are replicated, and XLA inserts the
gradient all-reduce over ICI automatically from the sharding constraints
(jit + NamedSharding — the "How to Scale Your Model" recipe: pick a mesh,
annotate, let XLA place collectives).

Beyond DP, two further axes exist where the workload has real scale:
sample-parallel (the samples-per-ray quadrature of grid_intervals,
tnerf/parallel/sample_parallel.py) and table-parallel (the hash-grid
level tables, tnerf/parallel/table_parallel.py), each composing with DP
on a 2-D mesh — and with EACH OTHER on a 3-axis
("data", "sample", "model") mesh, where the SP renderer folds the
table-sharded encode into its single shard_map (shard_maps do not
nest; see sample_parallel.make_sp_interval_renderer's model_axis).
PP is N/A (a 2-8 layer MLP has no pipeline depth) and
EP is N/A (no sparse expert routing in the model family) — documented
out of scope, matching the reference's capability set (SURVEY §2.4).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tnerf.train import RayBatch


def make_mesh(
    n_devices: int = -1,
    axis_name: str = "data",
    extra_axis: Optional[str] = None,
    n_extra: int = 1,
    extra_axis2: Optional[str] = None,
    n_extra2: int = 1,
) -> Mesh:
    """Device mesh over the ray (data) axis, optionally with a second
    and third axis (sample- and/or table-parallel): shape
    (n_devices, n_extra[, n_extra2])."""
    devs = jax.devices()
    axes = [(axis_name, n_devices)]
    if extra_axis is not None and n_extra > 1:
        axes.append((extra_axis, n_extra))
    if extra_axis2 is not None and n_extra2 > 1:
        axes.append((extra_axis2, n_extra2))
    n_rest = int(np.prod([s for _, s in axes[1:]])) if len(axes) > 1 else 1
    if n_devices == -1:
        axes[0] = (axis_name, len(devs) // n_rest)
    total = axes[0][1] * n_rest
    if total > len(devs):
        raise ValueError(f"requested {total} devices, have {len(devs)}")
    if len(axes) == 1:
        return Mesh(np.asarray(devs[:total]), (axis_name,))
    return Mesh(
        np.asarray(devs[:total]).reshape([s for _, s in axes]),
        tuple(n for n, _ in axes),
    )


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch: RayBatch, mesh: Mesh, axis_name: str = "data") -> RayBatch:
    """Shard a ray batch's leading (ray) dim across the mesh."""
    s = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, s)


def make_dp_train_step(
    train_step,
    mesh: Mesh,
    axis_name: str = "data",
    with_occupancy: bool = False,
    state_sharding=None,
):
    """Wrap a (state, batch, key[, occupancy]) train step with data-parallel
    sharding constraints: state/key/occupancy replicated, batch sharded on
    rays, outputs replicated.

    The gradient psum over the "data" axis is inserted by XLA: each chip
    computes grads on its ray shard; the replicated-params output
    constraint forces an all-reduce over ICI.

    state_sharding: optional pytree of NamedShardings matching the train
    state, for states that are NOT fully replicated (table-parallel
    shards the hash tables + their optimizer state — see
    table_parallel.tp_state_sharding); the output state keeps it.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))
    st = repl if state_sharding is None else state_sharding
    in_sh = (st, shard, repl) + ((repl,) if with_occupancy else ())
    return jax.jit(
        train_step.__wrapped__ if hasattr(train_step, "__wrapped__") else train_step,
        in_shardings=in_sh,
        out_shardings=(st, repl),
    )


def dp_render_sharded(renderer, mesh: Mesh, axis_name: str = "data"):
    """Shard full-image rendering across chips: rays split over the mesh,
    pixels gathered back (the eval-time analog of DP training).

    Params inherit their committed sharding (None = respect placement)
    rather than being forced replicated: under pure DP they arrive
    replicated anyway, and under table parallelism the level-sharded
    hash tables keep their layout while rays still spread over the data
    axis."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    def fn(params, rays, key=None, occupancy=None):
        return renderer(params, rays, key, occupancy)

    return jax.jit(
        fn,
        in_shardings=(None, shard, repl, repl),
        out_shardings=shard,
    )
