"""INGP hash-grid architecture (reference model_type == 'hash').

Encoder config parity: 14 levels x 2 ch, base 16, desired res 2048*bound,
2^19 table (network.py:47-51) -> 28-d encoding into the shared heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
        gather_dtype=spec.hash_gather_dtype,
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


def attach_packed(params, spec: ModelSpec):
    """Precompute the packed-dense gather table for a FROZEN hash model.

    The distillation Trainer calls this once on the loaded teacher params;
    _encode then skips the in-graph table rebuild every step.  The extra
    '_packed' entry is a plain array leaf (jit/pytree friendly) and must not
    be checkpointed (engine/checkpoint strips any '_'-prefixed key).

    With spec.hash_bake_dense, ALL dense levels are additionally baked onto
    the finest dense level's lattice ('_baked': ONE gathered row per point
    for every dense level together, ops/hashgrid.build_baked_dense) —
    teacher-side approximation for the coarser dense levels, so it is
    opt-in and quality-A/B'd rather than default.
    """
    from pvd_tpu.ops.hashgrid import build_baked_dense, build_packed_dense

    gs = grid_spec(spec)
    dtype = jnp.dtype(gs.gather_dtype) if gs.gather_dtype else None
    if spec.hash_bake_dense:
        baked, _, _ = build_baked_dense(params["encoder"], gs, dtype=dtype)
        if baked is not None:
            return {**params, "_baked": _default_layout(baked)}
    packed, _ = build_packed_dense(params["encoder"], gs, dtype=dtype)
    if packed is None:
        return params
    return {**params, "_packed": _default_layout(packed)}


def _default_layout(x):
    """Re-place a one-time-built table in the default (row-major) layout.

    The bake/pack graphs commit their outputs column-major ({0,1}); the
    per-point row gather wants row-major, so every train step paid a
    relayout copy of the whole table first (traced: copy.619, 0.50 ms and
    249MB accessed per step for the [389017, 80] baked table).  A host
    round-trip re-places the buffer once, at attach time."""
    import numpy as np

    return jnp.asarray(np.asarray(x))


def _encode(params, spec: ModelSpec, x):
    from pvd_tpu.ops.hashgrid import baked_dense_plan, packed_level_offsets

    x01 = (x + spec.bound) / (2.0 * spec.bound)
    gs = grid_spec(spec)
    prebuilt = baked = None
    if "_baked" in params:
        fine, dense = baked_dense_plan(gs)
        baked = (params["_baked"], fine, dense)
    elif "_packed" in params:
        prebuilt = (params["_packed"], packed_level_offsets(gs))
    return hash_encode(
        params["encoder"], x01, gs,
        cell_table=params.get("encoder_cell"),
        prebuilt_packed=prebuilt,
        prebuilt_baked=baked,
    )


def forward(params, spec: ModelSpec, x, d, aabb, want_color: bool):
    del aabb  # hash grid uses the cubic bound, not the (shrinkable) aabb
    return shared_sigma_color(params, spec, _encode(params, spec, x), d, want_color)


def density(params, spec: ModelSpec, x, aabb):
    del aabb
    return shared_density(params, spec, _encode(params, spec, x))
