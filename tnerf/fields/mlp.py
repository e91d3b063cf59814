"""Plain pytree MLP with mixed-precision matmuls.

The TPU replacement for tcnn's FullyFusedMLP (reference main.cu:60-68,
used at main.cu:325,721,781): "fully fused" is what XLA already does with
a chain of jnp matmuls — each layer is one MXU pass with the activation
fused into it.  Mixed precision mirrors the reference's param layout
(main.cu:328-353: fp32 master params + fp16 compute copy): params are
stored fp32, matmuls run in bf16 with fp32 accumulation
(preferred_element_type), gradients come back fp32 via autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_mlp(
    key: jax.Array,
    in_dim: int,
    hidden_width: int,
    hidden_layers: int,
    out_dim: int,
) -> dict:
    """He-initialized MLP params: {'w': [W0..], 'b': [b0..]} (fp32).

    `hidden_layers` counts hidden matmuls, matching tcnn's n_hidden_layers
    (reference main.cu:66): layers = [in->w] + (hidden_layers-1)*[w->w]
    + [w->out].
    """
    dims = [in_dim] + [hidden_width] * hidden_layers + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    ws, bs = [], []
    for k, (d_in, d_out) in zip(keys, zip(dims[:-1], dims[1:])):
        std = (2.0 / d_in) ** 0.5
        ws.append(jax.random.normal(k, (d_in, d_out), jnp.float32) * std)
        bs.append(jnp.zeros((d_out,), jnp.float32))
    return {"w": ws, "b": bs}


def apply_mlp(
    params: dict,
    x: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    hidden_activation=jax.nn.relu,
) -> jnp.ndarray:
    """Forward pass. x: [..., in_dim] -> [..., out_dim] (fp32 out).

    Each layer: bf16 inputs x bf16 weights -> fp32 accumulation on the MXU
    (preferred_element_type), activation on the fp32 result, re-cast to
    bf16 for the next layer. The final layer's raw fp32 output is returned
    (activations like sigmoid/softplus are applied by the field head).
    """
    ws, bs = params["w"], params["b"]
    h = x.astype(compute_dtype)
    n = len(ws)
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        h = h + b  # fp32 bias add
        if i < n - 1:
            h = hidden_activation(h).astype(compute_dtype)
    return h


def mlp_num_params(in_dim: int, hidden_width: int, hidden_layers: int, out_dim: int) -> int:
    dims = [in_dim] + [hidden_width] * hidden_layers + [out_dim]
    return sum(a * b + b for a, b in zip(dims[:-1], dims[1:]))
