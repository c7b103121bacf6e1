"""Multi-chip scaling over a jax.sharding Mesh.

The reference has no working multi-device support (vestigial NCCL hooks only,
SURVEY.md §2.3).  Here scaling is data-parallel over the ray axis — every
per-ray op in the pipeline is embarrassingly parallel — with replicated
parameters (all four field architectures are tens of MB) and XLA-inserted
psum for gradient reduction over ICI.
"""

from pvd_tpu.parallel.mesh import (
    make_ray_mesh,
    ray_sharding,
    replicated_sharding,
    shard_batch,
)
from pvd_tpu.parallel.dp import (
    make_dp_distill_step,
    make_dp_eval_renderer,
    make_dp_occ_update,
    make_dp_teacher_step,
)

__all__ = [
    "make_ray_mesh",
    "ray_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_dp_teacher_step",
    "make_dp_distill_step",
    "make_dp_occ_update",
    "make_dp_eval_renderer",
]
