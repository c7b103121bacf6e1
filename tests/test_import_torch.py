"""Torch-checkpoint importer: key/layout mapping from reference state_dicts."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from pvd_tpu.config import ModelSpec, RenderSpec
from pvd_tpu.engine.import_torch import (
    load_torch_reference,
    params_from_state_dict,
)
from pvd_tpu.models import field_forward, init_field
from pvd_tpu.ops.morton import morton3d

AABB = jnp.array([-1.0, -1, -1, 1, 1, 1])


def _rand_t(rng, *shape):
    return torch.from_numpy(rng.normal(size=shape).astype(np.float32))


def _mlp_sd(rng, prefix, dims, bias=False):
    sd = {}
    for i in range(len(dims) - 1):
        sd[f"{prefix}.{i}.weight"] = _rand_t(rng, dims[i + 1], dims[i])
        if bias:
            sd[f"{prefix}.{i}.bias"] = _rand_t(rng, dims[i + 1])
    return sd


def test_vm_import_shapes_and_forward():
    spec = ModelSpec(model_type="vm", vm_resolution=(20, 22, 24))
    rng = np.random.default_rng(0)
    res = spec.vm_resolution
    sd = {}
    mat_ids = ((0, 1), (0, 2), (1, 2))
    vec_ids = (2, 1, 0)
    for prefix, rank in (("sigma", 16), ("color", 48)):
        for i in range(3):
            m0, m1 = mat_ids[i]
            sd[f"{prefix}_mat.{i}"] = _rand_t(rng, 1, rank, res[m1], res[m0])
            sd[f"{prefix}_vec.{i}"] = _rand_t(rng, 1, rank, res[vec_ids[i]], 1)
    sd["basis_mat.weight"] = _rand_t(rng, 15, 144)
    sd.update(_mlp_sd(rng, "color_net", [31, 64, 64, 3]))

    params = params_from_state_dict(
        {k: v.numpy() for k, v in sd.items()}, spec
    )
    ref = init_field(jax.random.PRNGKey(0), spec)
    for k in ("sigma_mat", "sigma_vec", "color_mat", "color_vec"):
        for a, b in zip(params[k], ref[k]):
            assert a.shape == b.shape, (k, a.shape, b.shape)
    assert params["basis_mat"]["w"].shape == ref["basis_mat"]["w"].shape

    # value spot check: torch [1,R,H,W] -> ours [H,W,R]
    np.testing.assert_allclose(
        np.asarray(params["sigma_mat"][0][3, 5, 7]),
        sd["sigma_mat.0"][0, 7, 3, 5].item(), rtol=1e-6,
    )

    x = jnp.asarray(rng.uniform(-1, 1, (9, 3)).astype(np.float32))
    d = jnp.asarray(np.tile([0.0, 0, 1.0], (9, 1)).astype(np.float32))
    out = field_forward(params, spec, x, d, AABB)
    assert np.all(np.isfinite(np.asarray(out.rgb)))


def test_full_ckpt_roundtrip_with_morton_grid(tmp_path):
    spec = ModelSpec(model_type="hash", hash_num_levels=4, hash_desired_res=64)
    rspec = RenderSpec(bound=1.0, grid_size=16, density_thresh=0.01)
    rng = np.random.default_rng(1)

    from pvd_tpu.ops.hashgrid import HashGridSpec

    gs = HashGridSpec(num_levels=4, desired_resolution=64)
    sd = {
        "encoder.embeddings": _rand_t(rng, gs.table_size, 2),
        "density_grid": _rand_t(rng, 1, 16**3),
    }
    sd.update(_mlp_sd(rng, "sigma_net", [8, 64, 16]))
    sd.update(_mlp_sd(rng, "color_net", [31, 64, 64, 3]))
    payload = {"model": sd, "global_step": 1234, "mean_density": 0.5,
               "mean_count": 42}
    path = str(tmp_path / "ref.pth")
    torch.save(payload, path)

    params, occ, meta = load_torch_reference(path, spec, rspec)
    assert meta["step"] == 1234 and meta["mean_count"] == 42
    assert occ.density_grid.shape == (1, 16, 16, 16)

    # Morton permutation: reference grid[morton(x,y,z)] == ours grid[x,y,z]
    g_ref = sd["density_grid"].numpy()[0]
    for (x, y, z) in [(0, 0, 0), (3, 7, 1), (15, 15, 15), (5, 2, 9)]:
        code = int(morton3d(jnp.array([[x, y, z]]))[0])
        np.testing.assert_allclose(
            np.asarray(occ.density_grid[0, x, y, z]), g_ref[code], rtol=1e-6
        )
