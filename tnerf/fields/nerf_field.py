"""The radiance field: encoding + MLP + activations.

Mirrors the reference network's contract (main.cu:35-69,322-325): a 5-D
input (x, y, z, theta, phi) — positions plus the spherical view direction
computed in raygen (optixPrograms.cu:71-73) — through a composite
frequency encoding into an 8x128 ReLU MLP producing 4 outputs (RGB,
sigma).  Differences from the reference, by design (intended semantics,
not defects):

- RGB uses sigmoid (as the reference's output_activation), but density
  uses softplus/relu/exp instead of sigmoid — a sigmoid-bounded density
  cannot represent opaque surfaces (quadrature needs unbounded sigma).
- Positions are normalized to the grid AABB before encoding, replacing
  the implicit [-1,1] assumption + /10 origin hack (D9).

Two architectures:
- "fused5d": one trunk on enc(x) ++ enc(view) -> 4 (reference parity).
- "twobranch": density trunk on enc(x) -> [sigma, geo-features]; color
  head on [geo ++ enc(view)] -> rgb (original-NeRF/Instant-NGP style;
  view-independent geometry, better quality — used with hashgrid).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tnerf.cameras import thetaphi_to_unit
from tnerf.config import FieldConfig, GridConfig
from tnerf.fields.encodings import (
    frequency_encoding,
    frequency_encoding_dim,
    sh_encoding,
    sh_encoding_dim,
)
from tnerf.fields.mlp import apply_mlp, init_mlp

GEO_FEATURES = 15  # geometry feature width for the twobranch color head


def _density_activation(raw: jnp.ndarray, kind: str = "softplus") -> jnp.ndarray:
    if kind == "softplus":
        return jax.nn.softplus(raw - 1.0)
    if kind == "relu":
        return jax.nn.relu(raw)
    if kind == "exp":
        return jnp.exp(jnp.clip(raw - 1.0, -15.0, 15.0))
    raise ValueError(f"unknown density activation {kind!r}")


@dataclass(frozen=True)
class NeRFField:
    """Stateless apply/init wrapper; parameters live in an external pytree
    (functional JAX style — the analog of the reference's flat
    params_buffer, main.cu:328-342, but structured)."""

    config: FieldConfig
    grid: GridConfig
    arch: str = "fused5d"  # fused5d | twobranch
    density_act: str = "softplus"
    # (mesh, axis_name, data_axis | None) to shard the feature tables
    # across a mesh axis (tnerf/parallel/table_parallel.py) — hash-grid
    # level tables level-major, triplane planes/lines on the feature
    # axis; None = local tables.
    table_parallel: Optional[tuple] = None
    # (axis_name, n_shards): apply() is being traced INSIDE a shard_map
    # whose mapped axes include axis_name, with params["hashgrid"]["tables"]
    # already this shard's local level block — encode via
    # tp_encode_local's in-shard_map collectives instead of wrapping a
    # (non-nestable) shard_map of our own.  Set by the sample-parallel
    # renderer when composing SP x TP on a 3-axis mesh.
    tp_inline: Optional[tuple] = None

    def _apply_hashgrid(self, params: dict, xn01: jnp.ndarray) -> jnp.ndarray:
        if self.tp_inline is not None:
            from tnerf.parallel.table_parallel import tp_encode_local

            ax, n = self.tp_inline
            return tp_encode_local(params["tables"], xn01, self.config, ax, n)
        if self.table_parallel is not None:
            from tnerf.parallel.table_parallel import tp_apply_hashgrid

            mesh, ax, data_ax = self.table_parallel
            return tp_apply_hashgrid(
                params, xn01, self.config, mesh, ax, data_axis=data_ax
            )
        from tnerf.fields.hashgrid import apply_hashgrid

        return apply_hashgrid(params, xn01, self.config)

    # ---- geometry helpers --------------------------------------------------
    def normalize_positions(self, x: jnp.ndarray) -> jnp.ndarray:
        """Map grid-AABB coordinates to [-1, 1]^3 for encoding."""
        lo = jnp.asarray(self.grid.aabb_min, jnp.float32)
        hi = jnp.asarray(self.grid.aabb_max, jnp.float32)
        return 2.0 * (x - lo) / (hi - lo) - 1.0

    def _encode_pos(self, x: jnp.ndarray, window=None) -> jnp.ndarray:
        xn = self.normalize_positions(x)
        if self.config.encoding == "frequency":
            return frequency_encoding(
                xn, self.config.n_frequencies, window=window
            )
        if self.config.encoding in ("hashgrid", "triplane", "cp"):
            raise ValueError(
                f"{self.config.encoding} encoding is applied via params; use apply()"
            )
        raise ValueError(f"unknown encoding {self.config.encoding!r}")

    def _freq_window(self, params: dict):
        """BARF coarse-to-fine band weights when the train step rides a
        `freq_alpha` scalar in the params (train.freq_anneal_steps).
        stop_gradient: alpha is schedule state, not a trainable."""
        if self.config.encoding != "frequency" or "freq_alpha" not in params:
            return None
        from tnerf.fields.encodings import barf_window

        return barf_window(
            jax.lax.stop_gradient(params["freq_alpha"]),
            self.config.n_frequencies,
        )

    def _feature_encode(self, params: dict, positions: jnp.ndarray) -> jnp.ndarray:
        """Parameterized (table-backed) spatial encodings: hashgrid or
        triplane features from [0,1]^3-normalized positions."""
        xn01 = 0.5 * (self.normalize_positions(positions) + 1.0)
        if self.config.encoding == "cp":
            from tnerf.fields.triplane import apply_cp

            return apply_cp(params["cp"], xn01, self.config)
        if self.config.encoding == "triplane":
            if self.table_parallel is not None:
                from tnerf.parallel.table_parallel import tp_apply_triplane

                mesh, ax, data_ax = self.table_parallel
                return tp_apply_triplane(
                    params["triplane"], xn01, self.config, mesh, ax,
                    data_axis=data_ax,
                )
            from tnerf.fields.triplane import apply_triplane

            return apply_triplane(params["triplane"], xn01, self.config)
        return self._apply_hashgrid(params["hashgrid"], xn01)

    def _encode_view(self, viewdirs: jnp.ndarray) -> jnp.ndarray:
        """viewdirs: [..., 2] (theta, phi) or [..., 3] unit vector."""
        if self.config.view_encoding == "sh":
            # spherical harmonics need the unit 3-vector regardless of
            # view_param (sh_encoding normalizes internally)
            if viewdirs.shape[-1] == 2:
                viewdirs = thetaphi_to_unit(viewdirs)
            return sh_encoding(viewdirs, self.config.sh_degree)
        if self.config.view_encoding != "frequency":
            raise ValueError(
                f"unknown view_encoding {self.config.view_encoding!r}"
            )
        if viewdirs.shape[-1] == 3 and self.config.view_param == "thetaphi":
            from tnerf.cameras import viewdirs_to_thetaphi

            viewdirs = viewdirs_to_thetaphi(viewdirs)
        elif viewdirs.shape[-1] == 2 and self.config.view_param == "unit":
            viewdirs = thetaphi_to_unit(viewdirs)
        if self.config.view_param == "thetaphi":
            # normalize (theta, phi) into [-1, 1] like the spatial dims
            scale = jnp.asarray([1.0 / jnp.pi, 1.0 / jnp.pi], jnp.float32)
            viewdirs = viewdirs * scale
        return frequency_encoding(viewdirs, self.config.n_frequencies_view)

    # ---- dims --------------------------------------------------------------
    @property
    def _pos_enc_dim(self) -> int:
        if self.config.encoding == "frequency":
            return frequency_encoding_dim(3, self.config.n_frequencies)
        if self.config.encoding == "triplane":
            return 3 * self.config.tri_features
        if self.config.encoding == "cp":
            return self.config.tri_features
        # hashgrid: levels * features
        return self.config.hash_levels * self.config.hash_features_per_level

    @property
    def _view_enc_dim(self) -> int:
        if self.config.view_encoding == "sh":
            return sh_encoding_dim(self.config.sh_degree)
        d = 2 if self.config.view_param == "thetaphi" else 3
        return frequency_encoding_dim(d, self.config.n_frequencies_view)

    def _mlp_shape(self) -> Tuple[int, int]:
        if self.config.encoding == "hashgrid":
            return self.config.hash_hidden_width, self.config.hash_hidden_layers
        if self.config.encoding in ("triplane", "cp"):
            return self.config.tri_hidden_width, self.config.tri_hidden_layers
        return self.config.hidden_width, self.config.hidden_layers

    # ---- params ------------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        width, layers = self._mlp_shape()
        params: dict = {}
        k_enc, k_trunk, k_color = jax.random.split(key, 3)
        if self.config.encoding == "hashgrid":
            from tnerf.fields.hashgrid import init_hashgrid

            params["hashgrid"] = init_hashgrid(k_enc, self.config)
        elif self.config.encoding == "triplane":
            from tnerf.fields.triplane import init_triplane

            params["triplane"] = init_triplane(k_enc, self.config)
        elif self.config.encoding == "cp":
            from tnerf.fields.triplane import init_cp

            params["cp"] = init_cp(k_enc, self.config)
        if self.arch == "fused5d":
            in_dim = self._pos_enc_dim + self._view_enc_dim
            params["trunk"] = init_mlp(k_trunk, in_dim, width, layers, 4)
        elif self.arch == "twobranch":
            params["trunk"] = init_mlp(
                k_trunk, self._pos_enc_dim, width, layers, 1 + GEO_FEATURES
            )
            params["color"] = init_mlp(
                k_color, GEO_FEATURES + self._view_enc_dim, width, 2, 3
            )
        else:
            raise ValueError(f"unknown arch {self.arch!r}")
        return params

    # ---- forward -----------------------------------------------------------
    def apply(
        self, params: dict, positions: jnp.ndarray, viewdirs: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """positions [..., 3], viewdirs [..., 2|3] -> (rgb [..., 3], sigma [...])."""
        dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        if self.config.encoding in ("hashgrid", "triplane", "cp"):
            pos_enc = self._feature_encode(params, positions)
        else:
            pos_enc = self._encode_pos(positions, self._freq_window(params))
        view_enc = self._encode_view(viewdirs)

        if self.arch == "fused5d":
            h = jnp.concatenate(
                [pos_enc, jnp.broadcast_to(view_enc, (*pos_enc.shape[:-1], view_enc.shape[-1]))],
                axis=-1,
            )
            out = apply_mlp(params["trunk"], h, compute_dtype=dtype)
            rgb = jax.nn.sigmoid(out[..., :3])
            sigma = _density_activation(out[..., 3], self.density_act)
            return rgb, sigma

        # twobranch
        trunk_out = apply_mlp(params["trunk"], pos_enc, compute_dtype=dtype)
        sigma = _density_activation(trunk_out[..., 0], self.density_act)
        geo = trunk_out[..., 1:]
        h = jnp.concatenate(
            [geo, jnp.broadcast_to(view_enc, (*geo.shape[:-1], view_enc.shape[-1]))],
            axis=-1,
        )
        rgb = jax.nn.sigmoid(apply_mlp(params["color"], h, compute_dtype=dtype))
        return rgb, sigma

    def density(self, params: dict, positions: jnp.ndarray) -> jnp.ndarray:
        """Density-only query (for occupancy-grid updates — cheaper than
        apply() for twobranch; same cost for fused5d)."""
        if self.arch == "twobranch":
            if self.config.encoding in ("hashgrid", "triplane", "cp"):
                pos_enc = self._feature_encode(params, positions)
            else:
                pos_enc = self._encode_pos(positions, self._freq_window(params))
            dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
            trunk_out = apply_mlp(params["trunk"], pos_enc, compute_dtype=dtype)
            return _density_activation(trunk_out[..., 0], self.density_act)
        # fused5d needs a view dir; density is view-independent by
        # construction only in twobranch, so probe with a fixed direction.
        probe = jnp.zeros((*positions.shape[:-1], 2), jnp.float32)
        _, sigma = self.apply(params, positions, probe)
        return sigma
