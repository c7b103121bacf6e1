"""Pure-JAX compute ops: the TPU-native equivalents of the reference's three
CUDA extensions (raymarching/, gridencoder/, shencoder/) plus the pure-torch
helpers (tools/encoding.py, tools/activation.py)."""

from pvd_tpu.ops.activation import trunc_exp
from pvd_tpu.ops.aabb import near_far_from_aabb, polar_from_ray
from pvd_tpu.ops.morton import morton3d, morton3d_invert
from pvd_tpu.ops.sh import sh_encode
from pvd_tpu.ops.freq import freq_encode, freq_output_dim
from pvd_tpu.ops.grid_sample import (
    grid_sample_1d,
    grid_sample_2d,
    grid_sample_3d,
)
from pvd_tpu.ops.hashgrid import HashGridSpec, hash_encode, init_hash_table

__all__ = [
    "trunc_exp",
    "near_far_from_aabb",
    "polar_from_ray",
    "morton3d",
    "morton3d_invert",
    "sh_encode",
    "freq_encode",
    "freq_output_dim",
    "grid_sample_1d",
    "grid_sample_2d",
    "grid_sample_3d",
    "HashGridSpec",
    "hash_encode",
    "init_hash_table",
]
