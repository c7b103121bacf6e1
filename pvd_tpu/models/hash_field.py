"""INGP hash-grid architecture (reference model_type == 'hash').

Encoder config parity: 14 levels x 2 ch, base 16, desired res 2048*bound,
2^19 table (network.py:47-51) -> 28-d encoding into the shared heads.
"""

from __future__ import annotations

import jax

from pvd_tpu.config import ModelSpec
from pvd_tpu.models.common import init_mlp, mlp_dims
from pvd_tpu.models.heads import shared_density, shared_sigma_color
from pvd_tpu.ops.hashgrid import HashGridSpec, hash_encode, init_hash_table


def grid_spec(spec: ModelSpec) -> HashGridSpec:
    return HashGridSpec(
        input_dim=3,
        num_levels=spec.hash_num_levels,
        level_dim=spec.hash_level_dim,
        base_resolution=spec.hash_base_res,
        log2_hashmap_size=spec.hash_log2_size,
        desired_resolution=int(spec.hash_desired_res * spec.bound),
        n_cell_levels=spec.hash_cell_levels,
    )


def init(rng, spec: ModelSpec):
    ks = jax.random.split(rng, 4)
    gs = grid_spec(spec)
    in_dim = gs.output_dim
    params = {}
    if gs.cell_table_size:
        from pvd_tpu.ops.hashgrid import init_cell_table

        params["encoder_cell"] = init_cell_table(ks[3], gs)
    return {
        **params,
        "encoder": init_hash_table(ks[0], gs),
        "sigma_net": init_mlp(
            ks[1],
            mlp_dims(in_dim, spec.hidden_dim, 1 + spec.geo_feat_dim, spec.num_layers),
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
    x01 = (x + spec.bound) / (2.0 * spec.bound)
    return hash_encode(
        params["encoder"], x01, grid_spec(spec),
        cell_table=params.get("encoder_cell"),
    )


def forward(params, spec: ModelSpec, x, d, aabb, want_color: bool):
    del aabb  # hash grid uses the cubic bound, not the (shrinkable) aabb
    return shared_sigma_color(params, spec, _encode(params, spec, x), d, want_color)


def density(params, spec: ModelSpec, x, aabb):
    del aabb
    return shared_density(params, spec, _encode(params, spec, x))
