"""Mesh construction + data-parallel training over rays.

The reference has no multi-device story at all — no NCCL/MPI, no
collectives, two unsynchronized CUDA streams as its only concurrency
(SURVEY §2.4).  The TPU framework's parallelism is the one natural to
NeRF: rays are i.i.d., so the ray batch is sharded across chips over a
1-D mesh ("data" axis), parameters are replicated, and XLA inserts the
gradient all-reduce over ICI automatically from the sharding constraints
(jit + NamedSharding — the "How to Scale Your Model" recipe: pick a mesh,
annotate, let XLA place collectives).

TP/PP/SP/EP are N/A for a 128-wide MLP workload (documented out of scope,
matching the reference's capability set — SURVEY §2.4); the "long axis"
analog, samples-per-ray, is bounded and tiled in VMEM instead (SURVEY §5).
"""

from __future__ import annotations



import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tnerf.train import RayBatch


def make_mesh(n_devices: int = -1, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the ray (data) axis."""
    devs = jax.devices()
    if n_devices == -1:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis_name,))


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
):
    """Wrap a (state, batch, key[, occupancy]) train step with data-parallel
    sharding constraints: state/key/occupancy replicated, batch sharded on
    rays, outputs replicated.

    The gradient psum over the "data" axis is inserted by XLA: each chip
    computes grads on its ray shard; the replicated-params output
    constraint forces an all-reduce over ICI.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))
    in_sh = (repl, shard, repl) + ((repl,) if with_occupancy else ())
    return jax.jit(
        train_step.__wrapped__ if hasattr(train_step, "__wrapped__") else train_step,
        in_shardings=in_sh,
        out_shardings=(repl, repl),
    )


def dp_render_sharded(renderer, mesh: Mesh, axis_name: str = "data"):
    """Shard full-image rendering across chips: rays split over the mesh,
    pixels gathered back (the eval-time analog of DP training)."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    def fn(params, rays, key=None, occupancy=None):
        return renderer(params, rays, key, occupancy)

    return jax.jit(
        fn,
        in_shardings=(repl, shard, repl, repl),
        out_shardings=shard,
    )
