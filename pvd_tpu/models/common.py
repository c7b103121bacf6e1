"""Shared MLP building blocks.

Initialization matches torch.nn.Linear defaults (kaiming-uniform weights and
uniform bias, both with bound 1/sqrt(fan_in)) so that training dynamics are
comparable with the reference's heads (network.py:103-152).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def init_linear(rng, in_dim: int, out_dim: int, bias: bool = True):
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(jnp.float32(in_dim))
    p = {
        "w": jax.random.uniform(
            kw, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    }
    if bias:
        p["b"] = jax.random.uniform(
            kb, (out_dim,), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    return p


def apply_linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_mlp(rng, dims: Sequence[int], bias: bool = False) -> List[dict]:
    """dims: [in, h, ..., out]. Returns a list of per-layer param dicts."""
    keys = jax.random.split(rng, len(dims) - 1)
    return [
        init_linear(k, dims[i], dims[i + 1], bias=bias) for i, k in enumerate(keys)
    ]


def apply_mlp(layers: List[dict], x, final_activation: Optional[str] = None):
    """ReLU between layers, none after the last (matching the heads)."""
    for i, p in enumerate(layers):
        x = apply_linear(p, x)
        if i != len(layers) - 1:
            x = jax.nn.relu(x)
    if final_activation == "sigmoid":
        x = jax.nn.sigmoid(x)
    return x


def mlp_dims(in_dim: int, hidden: int, out_dim: int, num_layers: int):
    return [in_dim] + [hidden] * (num_layers - 1) + [out_dim]
