"""Device-mesh parallelism (SURVEY §2.4: the reference is strictly
single-GPU; this layer is new capability, not a port)."""

from tnerf.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_dp_train_step,
    replicate,
    shard_batch,
)
