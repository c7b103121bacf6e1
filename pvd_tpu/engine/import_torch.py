"""Import reference torch checkpoints (.pth) for cross-validation.

Maps the reference NeRFNetwork state_dict (distill_mutual/network.py) onto
pvd_tpu param pytrees, including layout changes:
  * torch Linear weights [out, in] -> ours [in, out] (transpose)
  * VM planes [1, R, H, W] -> [H, W, R]; lines [1, R, L, 1] -> [L, R]
  * Plenoxels volume [1, C, D, H, W] -> [D, H, W, C]
  * density_grid [CAS, H^3] Morton order -> row-major [CAS, H, H, H]

The checkpoint dict layout follows Trainer.save_checkpoint
(distill_mutual/utils.py:1405-1475): {epoch, global_step, stats,
model=state_dict, mean_count, mean_density[, resolution]}.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec, RenderSpec
from pvd_tpu.render.occupancy import OccupancyState, from_morton_order


def _t(x):
    return jnp.asarray(np.asarray(x, np.float32))


def _mlp_from_sd(sd: Dict, prefix: str, n_layers: int):
    layers = []
    for i in range(n_layers):
        layer = {"w": _t(sd[f"{prefix}.{i}.weight"]).T}
        if f"{prefix}.{i}.bias" in sd:
            layer["b"] = _t(sd[f"{prefix}.{i}.bias"])
        layers.append(layer)
    return layers


def params_from_state_dict(sd: Dict, spec: ModelSpec):
    """Reference state_dict -> pvd_tpu params for `spec.model_type`."""
    params = {}
    mt = spec.model_type
    if mt in ("hash", "mlp"):
        params["sigma_net"] = _mlp_from_sd(sd, "sigma_net", spec.num_layers)
        params["color_net"] = _mlp_from_sd(sd, "color_net",
                                           spec.num_layers_color)
    if mt == "hash":
        params["encoder"] = _t(sd["encoder.embeddings"])
    elif mt == "mlp":
        params["nerf_mlp"] = _mlp_from_sd(sd, "nerf_mlp", spec.nerf_layer_num)
    elif mt == "vm":
        for prefix in ("sigma", "color"):
            params[f"{prefix}_mat"] = [
                _t(sd[f"{prefix}_mat.{i}"])[0].transpose(1, 2, 0)
                for i in range(3)
            ]
            params[f"{prefix}_vec"] = [
                _t(sd[f"{prefix}_vec.{i}"])[0, :, :, 0].T for i in range(3)
            ]
        params["basis_mat"] = {"w": _t(sd["basis_mat.weight"]).T}
        params["color_net"] = _mlp_from_sd(sd, "color_net",
                                           spec.num_layers_color)
    elif mt == "tensors":
        params["volume"] = _t(sd["tensor_volume.0"])[0].transpose(1, 2, 3, 0)
    if "bg_net.0.weight" in sd:
        params["bg"] = {
            "encoder": _t(sd["encoder_bg.embeddings"]),
            "net": _mlp_from_sd(sd, "bg_net", spec.num_layers_bg),
        }
    return params


def occupancy_from_state_dict(sd: Dict, rspec: RenderSpec,
                              mean_density: float = 0.0) -> OccupancyState:
    H, C = rspec.grid_size, rspec.cascades
    grid_m = _t(sd["density_grid"]).reshape(C, H * H * H)
    grid = from_morton_order(grid_m, H)
    thresh = min(float(mean_density), rspec.density_thresh)
    bitfield = (grid > thresh).reshape(-1)
    b = rspec.bound
    aabb = jnp.asarray(
        np.asarray(sd.get("aabb_train", [-b, -b, -b, b, b, b]), np.float32))
    from pvd_tpu.render.occupancy import build_neighbor_masks, dilate_bitfield

    return OccupancyState(
        density_grid=grid,
        bitfield=bitfield,
        bitfield_dilated=dilate_bitfield(bitfield, H),
        neighbor_masks=build_neighbor_masks(bitfield, H),
        mean_density=jnp.float32(mean_density),
        iter_density=jnp.int32(16),
        aabb_train=aabb,
        aabb_infer=jnp.asarray(
            np.asarray(sd.get("aabb_infer", [-b, -b, -b, b, b, b]), np.float32)
        ),
    )


def load_torch_reference(path: str, spec: ModelSpec, rspec: RenderSpec):
    """Load a reference .pth -> (params, occ_state, meta)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("model", payload)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params = params_from_state_dict(sd, spec)
    occ = occupancy_from_state_dict(
        sd, rspec, mean_density=float(payload.get("mean_density", 0.0))
    )
    meta = {
        "step": int(payload.get("global_step", 0)),
        "mean_count": int(payload.get("mean_count", 0)),
        "resolution": payload.get("resolution"),
    }
    return params, occ, meta
