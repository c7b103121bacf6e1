"""Unified field-network interface over the four architectures.

Every architecture exposes the same functional surface (the key design that
makes any-to-any distillation work — the reference forces NeRF's MLP through
the same shared sigma_net for exactly this reason, network.py:56-70):

  init_field(rng, spec)                          -> params pytree
  field_forward(params, spec, x, d, aabb, ...)   -> FieldOut
  field_density(params, spec, x, aabb)           -> sigma [N]

FieldOut carries the three distillation-aligned point tensors of the
reference (network.py:362-436): `fea_sc` (16-d pre-activation feature with
the sigma logit in channel 0), `sigma_logit` (pre-trunc_exp, clipped to
[sigma_clip_min, sigma_clip_max]), and `rgb` (post-sigmoid).  During
distillation stage 1 `want_color=False` skips all color work
(network.py:365-369).

`aabb` [6] is dynamic state (the VM shrink op changes it mid-training,
network.py:589-643); hash/mlp ignore it and use spec.bound.  All functions
are pure and jit-friendly; `spec` and `want_color` are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec
from pvd_tpu.models import hash_field, mlp_field, tensors_field, vm_field
from pvd_tpu.models.common import apply_mlp, init_mlp, mlp_dims
from pvd_tpu.models.heads import FieldOut
from pvd_tpu.ops.sh import sh_encode

_IMPLS = {
    "hash": hash_field,
    "mlp": mlp_field,
    "vm": vm_field,
    "tensors": tensors_field,
}


def init_field(rng, spec: ModelSpec):
    params = _IMPLS[spec.model_type].init(rng, spec)
    if spec.bg_radius > 0:
        # the reference builds the bg sphere net for ANY model_type
        # (network.py:154-182) — including tensors, whose dir encoder is
        # the plenoxel-degree SH (ModelSpec.dir_sh_degree handles that)
        params["bg"] = _init_bg(jax.random.fold_in(rng, 0xB6), spec)
    return params


def field_forward(params, spec: ModelSpec, x, d, aabb, want_color: bool = True
                  ) -> FieldOut:
    """x: [N, 3] in [-bound, bound]; d: [N, 3] unit directions."""
    return _IMPLS[spec.model_type].forward(params, spec, x, d, aabb, want_color)


def field_density(params, spec: ModelSpec, x, aabb):
    """Density-only query for occupancy-grid maintenance (renderer.py:648+)."""
    return _IMPLS[spec.model_type].density(params, spec, x, aabb)


def param_group_label(spec: ModelSpec):
    """Map each leaf path to an LR group ('main' or 'head_lr2').

    Mirrors NeRFNetwork.get_params (network.py:646-683): only the VM
    architecture puts its color_net and basis_mat on the secondary LR.
    Returns fn(path_tuple) -> str usable with optax.multi_transform.
    """

    def label(path) -> str:
        if spec.model_type == "vm" and path and path[0] in ("color_net", "basis_mat"):
            return "head_lr2"
        return "main"

    return label


def trainable_label(spec: ModelSpec, distill_mode: str):
    """fn(path)->bool: which params train under fix_mlp distillation.

    fix_mlp freezes the shared MLP heads and trains only the spatial
    representation (main_distill_mutual.py:322-332).  The reference's group
    slicing is buggy for hash/tensors students (it slices group lists by a
    hardcoded index); we implement the intent: sigma_net/color_net frozen,
    everything else (encoder/nerf_mlp/tensor params/basis_mat) trainable.
    """

    def is_trainable(path) -> bool:
        if distill_mode != "fix_mlp":
            return True
        return not (path and path[0] in ("sigma_net", "color_net"))

    return is_trainable


def vm_density_l1(params):
    """L1 regularizer over the VM sigma planes/lines (network.py:548-557)."""
    return vm_field.density_l1(params)


# ---- background sphere model (bg_radius > 0, network.py:154-182) ---------


def bg_grid_spec():
    from pvd_tpu.ops.hashgrid import HashGridSpec

    return HashGridSpec(
        input_dim=2, num_levels=4, level_dim=2, base_resolution=16,
        log2_hashmap_size=19, desired_resolution=2048,
    )


def _init_bg(rng, spec: ModelSpec):
    from pvd_tpu.ops.hashgrid import init_hash_table

    k1, k2 = jax.random.split(rng)
    in_dim = bg_grid_spec().output_dim + spec.dir_sh_degree**2
    return {
        "encoder": init_hash_table(k1, bg_grid_spec()),
        "net": init_mlp(
            k2, mlp_dims(in_dim, spec.hidden_dim_bg, 3, spec.num_layers_bg)
        ),
    }


def background_rgb(params, spec: ModelSpec, polar, d):
    """polar: [N, 2] in [-1,1]; d: [N, 3]. Returns [N, 3] sigmoid RGB."""
    from pvd_tpu.ops.hashgrid import hash_encode

    h = hash_encode(params["bg"]["encoder"], (polar + 1.0) * 0.5, bg_grid_spec())
    enc_d = sh_encode(d, spec.dir_sh_degree)
    return apply_mlp(
        params["bg"]["net"],
        jnp.concatenate([enc_d, h], axis=-1),
        final_activation="sigmoid",
    )
