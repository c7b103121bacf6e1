"""Classic NeRF MLP architecture (reference model_type == 'mlp').

A PE(10) frequency encoding feeds an 8x256 MLP (with biases, skip concat of
the encoded input after layer `skip`) whose 28-d output is treated as a
pseudo-encoding into the SAME shared sigma_net/color_net heads
(network.py:56-70, forward_nerf_mlp :324-333).  Re-expressing NeRF in the
shared geometry is what makes mlp<->anything distillation possible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec
from pvd_tpu.models.common import apply_linear, init_linear, init_mlp, mlp_dims
from pvd_tpu.models.heads import shared_density, shared_sigma_color
from pvd_tpu.ops.freq import freq_encode, freq_output_dim


def pe_dim(spec: ModelSpec) -> int:
    return freq_output_dim(3, spec.pe_multires)


def encoder_out_dim(spec: ModelSpec) -> int:
    # the nerf_mlp emits the same width the hash encoder would
    return spec.hash_num_levels * spec.hash_level_dim


def init(rng, spec: ModelSpec):
    ks = jax.random.split(rng, 3)
    in_dim = pe_dim(spec)
    W = spec.nerf_layer_wide
    n = spec.nerf_layer_num

    # layer dims mirror network.py:62-70: [in->W], middles (skip layer takes
    # W+in_dim), final [W->28]; all WITH bias (torch Linear default).
    layer_keys = jax.random.split(ks[0], n)
    layers = [init_linear(layer_keys[0], in_dim, W, bias=True)]
    for i in range(n - 2):
        # overall layer index is i+1; the concat happens after overall layer
        # `skip`, so overall layer skip+1 (i == skip here) widens its input
        d_in = W + in_dim if i == spec.skip else W
        layers.append(init_linear(layer_keys[i + 1], d_in, W, bias=True))
    layers.append(init_linear(layer_keys[n - 1], W, encoder_out_dim(spec), bias=True))

    return {
        "nerf_mlp": layers,
        "sigma_net": init_mlp(
            ks[1],
            mlp_dims(
                encoder_out_dim(spec),
                spec.hidden_dim,
                1 + spec.geo_feat_dim,
                spec.num_layers,
            ),
        ),
        "color_net": init_mlp(
            ks[2],
            mlp_dims(
                spec.dir_sh_degree**2 + spec.geo_feat_dim,
                spec.hidden_dim_color,
                3,
                spec.num_layers_color,
            ),
        ),
    }


def _encode(params, spec: ModelSpec, x):
    cdt = jnp.dtype(spec.compute_dtype)
    pe = freq_encode(x, spec.pe_multires).astype(cdt)
    h = pe
    layers = params["nerf_mlp"]
    for i, p in enumerate(layers):
        h = apply_linear(p, h)
        if i != len(layers) - 1:
            h = jax.nn.relu(h)
        if i == spec.skip:
            h = jnp.concatenate([pe, h], axis=-1)
    return h.astype(jnp.float32)


def forward(params, spec: ModelSpec, x, d, aabb, want_color: bool):
    del aabb
    return shared_sigma_color(params, spec, _encode(params, spec, x), d, want_color)


def density(params, spec: ModelSpec, x, aabb):
    del aabb
    return shared_density(params, spec, _encode(params, spec, x))
