"""pvd_tpu — TPU-native Progressive Volume Distillation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
megvii-research/AAAI2023-PVD ("One is All: Bridging the Gap Between Neural
Radiance Fields Architectures with Progressive Volume Distillation",
AAAI 2023): four interchangeable radiance-field architectures (INGP hash
grids, NeRF MLP, TensoRF-VM low-rank tensors, Plenoxels dense tensors)
behind one occupancy-grid-accelerated volumetric renderer, supporting
teacher training and any-to-any progressive distillation.

Design principles (TPU-first, not a port):
  * static shapes everywhere — the reference's ragged CSR sample buffers
    become padded [n_rays, max_samples] tensors with validity masks;
  * marching is reformulated as "occupancy lattice + compaction", which is
    exactly equivalent to the reference's per-ray DDA when dt_gamma == 0
    and fully parallel (no sequential skip loop);
  * compositing is a masked associative scan, differentiated by autodiff;
  * scatter-adds (hash-grid gradients) are XLA segment ops, no atomics;
  * scaling is a jax.sharding Mesh over the ray axis with replicated
    parameters and psum reductions.
"""

__version__ = "0.1.0"
