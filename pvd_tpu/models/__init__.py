"""Field networks: the four interchangeable radiance-field architectures
(hash/INGP, mlp/NeRF, vm/TensoRF-VM, tensors/Plenoxels) behind one
feature->sigma/color interface (reference: distill_mutual/network.py)."""

from pvd_tpu.models.api import (
    FieldOut,
    field_density,
    field_forward,
    init_field,
    param_group_label,
    vm_density_l1,
)

__all__ = [
    "FieldOut",
    "init_field",
    "field_forward",
    "field_density",
    "param_group_label",
    "vm_density_l1",
]
