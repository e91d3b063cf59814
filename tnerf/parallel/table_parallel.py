"""Table-parallel (TP) grid encodings: shard the feature tables.

The hash-grid's parameters are L level tables of T entries (tcnn
HashGrid role, /root/reference/main.cu:35-69 schema).  At production
NGP scales (T=2^19+, many scenes, optimizer state x3) the tables — not
the MLP — are the parameter memory; this module shards the LEVEL axis
across a mesh axis so each chip stores and updates only L/n tables.
The triplane family shards analogously on its FEATURE axis
(tp_apply_triplane below — the VM product is elementwise in features,
so the shard boundary needs no cross-chip arithmetic).

The encode is embarrassingly parallel over levels: positions are
replicated (they are activations, tiny next to the tables), each device
computes the features of ITS levels from purely local table rows, and
the per-level features concatenate on the feature axis.  The only
collective XLA inserts is the all-gather of the [N, L*F] FEATURE matrix
(and its reduce-scatter transpose in the backward) — never the tables
themselves.  This is the reduce-scatter/all-gather pattern of
megatron-style embedding sharding, riding ICI.

Gradients: table cotangents stay local to each shard (the scatter-add
of the gather VJP runs on-device); position cotangents psum across
shards.  Optimizer state shards with the tables for free under jit —
the round-trip is tested on the virtual mesh (tests/test_table_parallel.py).

hash_nearest_levels under TP: the nearest/trilinear split is static
per level in the single-device encode, but shard_map traces ONE program
for all shards — so TP expresses nearest interpolation BRANCHLESSLY by
snapping the fractional coordinates of nearest levels to {0, 1}
(frac >= 0.5, matching hashgrid._nearest_index).  The trilinear corner
weights then become exactly one-hot: seven corners contribute 0.0 and
the chosen corner is i0 + (frac >= 0.5) — the same vertex, bit-equal
features, same table cotangents.  (No FLOP saving, unlike the
single-device 1-corner fetch — TP is about parameter scale, not encode
FLOPs.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tnerf.config import FieldConfig
from tnerf.fields.hashgrid import _corner_index_weight, level_resolutions


def _local_encode(tables_l, res_l, dense_l, n1_l, x01, *, T, F,
                  nearest_l=None):
    """Gather-formulation encode for a LOCAL level block (runs inside
    shard_map).  tables_l [Ls*T, F]; res_l/dense_l/n1_l [Ls] per-level
    geometry as arrays (traced — the shard decides its levels at run
    time, one program for all shards).  nearest_l [Ls] bool marks
    nearest-interpolated levels: their fracs snap to {0,1} so the
    corner weights are one-hot (see module docstring)."""
    Ls = res_l.shape[0]
    resf = res_l.astype(jnp.float32)
    pos = x01[..., None, :] * resf[:, None]
    pos = jnp.clip(pos, 0.0, (resf[:, None] - 1e-4))
    i0f = jnp.floor(pos)
    frac = pos - i0f
    if nearest_l is not None:
        frac = jnp.where(
            nearest_l[:, None], (frac >= 0.5).astype(frac.dtype), frac
        )
    i0 = i0f.astype(jnp.uint32)
    level_off = jnp.arange(Ls, dtype=jnp.uint32) * jnp.uint32(T)

    out = jnp.zeros((*x01.shape[:-1], Ls, F), tables_l.dtype)
    for c in range(8):
        idx, w = _corner_index_weight(c, i0, frac, dense_l, n1_l, T)
        out = out + w[..., None] * tables_l[(idx + level_off).astype(jnp.int32)]
    return out.reshape(*x01.shape[:-1], Ls * F)


def tp_apply_hashgrid(
    params: dict,
    x01: jnp.ndarray,
    cfg: FieldConfig,
    mesh: Mesh,
    axis_name: str = "model",
    data_axis: str | None = None,
) -> jnp.ndarray:
    """apply_hashgrid with the level axis sharded over `axis_name`:
    x01 [..., 3] -> features [..., L*F] (feature axis sharded by level
    block; downstream consumers' sharding constraints insert the
    all-gather).

    data_axis: composing with DP, the leading batch axis of x01 shards
    over it (each chip encodes only its ray shard — without this every
    chip would all-gather the positions and redo the full-batch encode).
    Falls back to replicated positions when the leading dim does not
    divide (e.g. odd compacted-sample capacities) — correct either way.
    """
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    n = mesh.shape[axis_name]
    if L % n != 0:
        raise ValueError(
            f"hash_levels={L} must divide over {n} '{axis_name}' devices"
        )
    res = level_resolutions(cfg)
    res_j = jnp.asarray(res, jnp.int32)
    dense = jnp.asarray((res + 1) ** 3 <= T)
    n1 = jnp.asarray(res + 1, jnp.uint32)
    nearest = jnp.asarray(np.arange(L) < cfg.hash_nearest_levels)

    lead = None
    if (
        data_axis is not None
        and x01.ndim >= 2
        and x01.shape[0] % mesh.shape[data_axis] == 0
    ):
        lead = data_axis
    fn = shard_map(
        lambda tbl, r, dn, n1_, nr, x: _local_encode(
            tbl, r, dn, n1_, x, T=T, F=F, nearest_l=nr
        ),
        mesh=mesh,
        in_specs=(
            P(axis_name, None), P(axis_name), P(axis_name), P(axis_name),
            P(axis_name),
            P(lead, *((None,) * (x01.ndim - 1))),
        ),
        out_specs=P(lead, *((None,) * (x01.ndim - 2)), axis_name),
        check_vma=False,
    )
    return fn(params["tables"], res_j, dense, n1, nearest, x01)


def tp_encode_local(
    tables_local: jnp.ndarray,
    x01: jnp.ndarray,
    cfg: FieldConfig,
    axis_name: str,
    n_shards: int,
) -> jnp.ndarray:
    """Level-sharded hash encode for use INSIDE an existing shard_map —
    the composition primitive for 3-axis (data, sample, model) meshes,
    where nesting tp_apply_hashgrid's own shard_map is not possible.

    `tables_local` is this shard's [L/n * T, F] level-major block (the
    in_spec must shard the level axis over `axis_name`); `x01` the local
    [..., 3] positions in [0, 1].  Returns the FULL [..., L*F] feature
    matrix via a tiled all_gather over `axis_name` — the same megatron
    pattern as tp_apply_hashgrid (features move, tables never do; the
    all_gather's VJP reduce-scatters the feature cotangents so table
    gradients stay shard-local)."""
    L, F = cfg.hash_levels, cfg.hash_features_per_level
    T = 1 << cfg.hash_log2_table_size
    if L % n_shards != 0:
        raise ValueError(
            f"hash_levels={L} must divide over {n_shards} '{axis_name}' devices"
        )
    Ls = L // n_shards
    res = level_resolutions(cfg)
    res_full = jnp.asarray(res, jnp.int32)
    dense_full = jnp.asarray((res + 1) ** 3 <= T)
    n1_full = jnp.asarray(res + 1, jnp.uint32)
    nearest_full = jnp.asarray(np.arange(L) < cfg.hash_nearest_levels)
    start = jax.lax.axis_index(axis_name) * Ls
    res_l = jax.lax.dynamic_slice_in_dim(res_full, start, Ls)
    dense_l = jax.lax.dynamic_slice_in_dim(dense_full, start, Ls)
    n1_l = jax.lax.dynamic_slice_in_dim(n1_full, start, Ls)
    nearest_l = jax.lax.dynamic_slice_in_dim(nearest_full, start, Ls)
    feats = _local_encode(
        tables_local, res_l, dense_l, n1_l, x01, T=T, F=F, nearest_l=nearest_l
    )
    return jax.lax.all_gather(feats, axis_name, axis=feats.ndim - 1, tiled=True)


def tp_apply_triplane(
    params: dict,
    x01: jnp.ndarray,
    cfg: FieldConfig,
    mesh: Mesh,
    axis_name: str = "model",
    data_axis: str | None = None,
) -> jnp.ndarray:
    """apply_triplane with the FEATURE axis sharded over `axis_name`:
    planes [3, R*R, F] and lines [3, R, F] split into contiguous
    F/n-feature slices per chip.  The VM product is elementwise in the
    feature axis, so each shard computes its feature slice from purely
    local table entries (gather formulation — the TP design point is
    parameter/optimizer-state scale, not encode FLOPs); the per-shard
    [..., 3, F/n] products concatenate feature-minor on the last axis,
    which is exactly the single-device feature order, then reshape to
    [..., 3*F].  Table cotangents stay shard-local (the gather VJP's
    scatter-add runs on-device); position cotangents psum across shards
    — the same megatron-embedding pattern as tp_apply_hashgrid.

    data_axis: as in tp_apply_hashgrid — composing with DP, the leading
    batch axis shards over it when divisible, else positions replicate.
    """
    from tnerf.fields.triplane import vm_product_gather

    R, F = cfg.tri_resolution, cfg.tri_features
    n = mesh.shape[axis_name]
    if F % n != 0:
        raise ValueError(
            f"tri_features={F} must divide over {n} '{axis_name}' devices"
        )
    lead = None
    if (
        data_axis is not None
        and x01.ndim >= 2
        and x01.shape[0] % mesh.shape[data_axis] == 0
    ):
        lead = data_axis
    fn = shard_map(
        lambda p, l, x: vm_product_gather(p, l, x, R),
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name),
            P(None, None, axis_name),
            P(lead, *((None,) * (x01.ndim - 1))),
        ),
        out_specs=P(lead, *((None,) * (x01.ndim - 1)), axis_name),
        check_vma=False,
    )
    out = fn(params["planes"], params["lines"], x01)  # [..., 3, F]
    return out.reshape(*x01.shape[:-1], 3 * F)


def tp_state_sharding(tree, mesh: Mesh, axis_name: str = "model"):
    """Sharding pytree for a train state under table parallelism: every
    [L*T, F] leaf living under a 'tables' key, and every [3, M, F] leaf
    under a triplane 'planes'/'lines' key (the tables AND their
    optimizer-state mirrors — Adam's mu/nu copy the param tree) shards
    over `axis_name` (hashgrid: level-major rows; triplane: the feature
    axis); everything else replicates."""

    def spec_for(path, leaf):
        keys = {getattr(k, "key", getattr(k, "name", None)) for k in path}
        if "tables" in keys and getattr(leaf, "ndim", 0) == 2:
            return NamedSharding(mesh, P(axis_name, None))
        if (
            keys & {"planes", "lines"}
            and "triplane" in keys
            and getattr(leaf, "ndim", 0) == 3
        ):
            return NamedSharding(mesh, P(None, None, axis_name))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_hashgrid_params(params: dict, mesh: Mesh, axis_name: str = "model"):
    """Place the [L*T, F] tables level-sharded on the mesh (contiguous
    row blocks == whole levels because the layout is level-major)."""
    s = NamedSharding(mesh, P(axis_name, None))
    return {**params, "tables": jax.device_put(params["tables"], s)}


def shard_triplane_params(params: dict, mesh: Mesh, axis_name: str = "model"):
    """Place triplane planes/lines feature-sharded on the mesh
    (contiguous F/n slices — tp_apply_triplane's layout)."""
    s = NamedSharding(mesh, P(None, None, axis_name))
    return {
        **params,
        "planes": jax.device_put(params["planes"], s),
        "lines": jax.device_put(params["lines"], s),
    }
