"""Field-architecture tests: shapes, clipping, gradients, VM resize oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pvd_tpu.config import ModelSpec
from pvd_tpu.models import (
    field_density,
    field_forward,
    init_field,
    param_group_label,
    vm_density_l1,
)
from pvd_tpu.models.vm_field import _linear_resize_2d, upsample_params

SMALL_SPECS = {
    "hash": ModelSpec(model_type="hash", hash_num_levels=4, hash_desired_res=64),
    "mlp": ModelSpec(model_type="mlp", nerf_layer_num=4, nerf_layer_wide=32,
                     pe_multires=4, skip=1),
    "vm": ModelSpec(model_type="vm", vm_resolution=(24, 24, 24)),
    "tensors": ModelSpec(model_type="tensors", plenoxel_res=(16, 16, 16)),
}
AABB = jnp.array([-1.0, -1, -1, 1, 1, 1])


def _points(n=33, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(x), jnp.asarray(d)


@pytest.mark.parametrize("mtype", list(SMALL_SPECS))
def test_forward_shapes_and_ranges(mtype):
    spec = SMALL_SPECS[mtype]
    params = init_field(jax.random.PRNGKey(0), spec)
    x, d = _points()
    out = field_forward(params, spec, x, d, AABB, want_color=True)
    assert out.sigma.shape == (33,)
    assert out.rgb.shape == (33, 3)
    assert np.all(np.asarray(out.rgb) >= 0) and np.all(np.asarray(out.rgb) <= 1)
    assert np.all(np.asarray(out.sigma) >= 0)
    sl = np.asarray(out.sigma_logit)
    assert np.all(sl >= spec.sigma_clip_min - 1e-6)
    assert np.all(sl <= spec.sigma_clip_max + 1e-6)
    if mtype == "tensors":
        assert out.fea_sc is None
    else:
        assert out.fea_sc.shape == (33, 1 + spec.geo_feat_dim)
        # channel 0 of fea_sc IS the clipped sigma logit
        np.testing.assert_allclose(np.asarray(out.fea_sc[:, 0]), sl, atol=1e-6)

    sigma_d = field_density(params, spec, x, AABB)
    assert sigma_d.shape == (33,)
    assert np.all(np.isfinite(np.asarray(sigma_d)))


@pytest.mark.parametrize("mtype", ["hash", "mlp", "vm"])
def test_stage1_skips_color(mtype):
    spec = SMALL_SPECS[mtype]
    params = init_field(jax.random.PRNGKey(1), spec)
    x, d = _points(17)
    out = field_forward(params, spec, x, d, AABB, want_color=False)
    assert out.rgb is None
    assert out.fea_sc is not None


@pytest.mark.parametrize("mtype", list(SMALL_SPECS))
def test_gradients_flow(mtype):
    spec = SMALL_SPECS[mtype]
    params = init_field(jax.random.PRNGKey(2), spec)
    x, d = _points(16)

    def loss(p):
        out = field_forward(p, spec, x, d, AABB, want_color=True)
        return jnp.sum(out.rgb) + jnp.sum(out.sigma)

    g = jax.grad(loss)(params)
    total = sum(
        float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(g)
    )
    assert np.isfinite(total) and total > 0


def test_vm_param_groups():
    spec = SMALL_SPECS["vm"]
    label = param_group_label(spec)
    assert label(("color_net", 0, "w")) == "head_lr2"
    assert label(("basis_mat", "w")) == "head_lr2"
    assert label(("sigma_mat", 0)) == "main"
    label_h = param_group_label(SMALL_SPECS["hash"])
    assert label_h(("color_net", 0, "w")) == "main"


def test_vm_density_l1_positive():
    spec = SMALL_SPECS["vm"]
    params = init_field(jax.random.PRNGKey(3), spec)
    l1 = float(vm_density_l1(params))
    assert l1 > 0


def test_vm_resize_matches_torch_interpolate():
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(12, 18, 5)).astype(np.float32)
    ours = _linear_resize_2d(arr, (20, 31))
    want = F.interpolate(
        torch.from_numpy(arr.transpose(2, 0, 1))[None], size=(20, 31),
        mode="bilinear", align_corners=True,
    )[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_vm_upsample_changes_shapes_only():
    spec = SMALL_SPECS["vm"]
    params = init_field(jax.random.PRNGKey(4), spec)
    up = upsample_params(params, (36, 40, 44))
    assert up["sigma_mat"][0].shape == (40, 36, 16)  # [res_m1, res_m0, R]
    assert up["sigma_vec"][0].shape == (44, 16)  # vec_id 2
    assert up["color_mat"][2].shape == (44, 40, 48)  # mat_ids (1,2)
    # field still evaluates
    x, d = _points(9)
    out = field_forward(up, spec, x, d, AABB)
    assert np.all(np.isfinite(np.asarray(out.sigma)))


def test_tensors_color_is_sh_dot():
    spec = SMALL_SPECS["tensors"]
    params = init_field(jax.random.PRNGKey(5), spec)
    x, d = _points(8)
    out = field_forward(params, spec, x, d, AABB)
    # manual recomputation
    from pvd_tpu.ops.grid_sample import grid_sample_3d
    from pvd_tpu.ops.sh import sh_encode

    xn = 2 * (x - AABB[:3]) / (AABB[3:] - AABB[:3]) - 1
    h = grid_sample_3d(params["volume"], xn)
    sh_coef = np.asarray(h[:, 1:]).reshape(8, 3, 9)
    enc = np.asarray(sh_encode(d, 3))
    want = 1 / (1 + np.exp(-(sh_coef * enc[:, None, :]).sum(-1)))
    np.testing.assert_allclose(np.asarray(out.rgb), want, atol=1e-5)
