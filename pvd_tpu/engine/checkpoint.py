"""Checkpointing.

Native format: a pickled dict of numpy pytrees
  {step, params, ema_params, occ{density_grid,bitfield,mean_density,
   iter_density,aabb_train,aabb_infer}, stats, config_json, vm_resolution}
mirroring the logical keys of the reference's torch .pth
(distill_mutual/utils.py:1405-1475: epoch/global_step/stats/model/
mean_count/mean_density/resolution).  Retention: keep the last
`max_keep` checkpoints, plus a best-by-metric copy with EMA weights
swapped in when EMA is enabled (utils.py:1450-1471).

`load_torch_reference` imports a reference .pth for cross-validation:
it maps the reference state_dict keys onto our param tree (including the
Morton->row-major density-grid permutation).
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.render.occupancy import OccupancyState


def _to_numpy(tree):
    if isinstance(tree, dict):
        # '_'-prefixed entries are derived caches (e.g. the teacher's
        # '_packed' gather table, models/hash_field.attach_packed) — never
        # persisted; they are rebuilt after load
        tree = {k: v for k, v in tree.items() if not k.startswith("_")}
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path_dir: str,
    name: str,
    step: int,
    params,
    occ: OccupancyState,
    ema_params=None,
    stats: Optional[dict] = None,
    config_json: Optional[str] = None,
    max_keep: int = 2,
    filename: Optional[str] = None,
) -> str:
    """Write a checkpoint.  With `filename` (e.g. '{name}_best.ckpt') the
    file is written under that fixed name and exempt from step retention."""
    os.makedirs(path_dir, exist_ok=True)
    payload = {
        "step": int(step),
        "params": _to_numpy(params),
        "ema_params": None if ema_params is None else _to_numpy(ema_params),
        "occ": {
            "density_grid": np.asarray(occ.density_grid),
            "bitfield": np.asarray(occ.bitfield),
            "bitfield_dilated": np.asarray(occ.bitfield_dilated),
            "mean_density": float(occ.mean_density),
            "iter_density": int(occ.iter_density),
            "aabb_train": np.asarray(occ.aabb_train),
            "aabb_infer": np.asarray(occ.aabb_infer),
        },
        "stats": stats or {},
        "config_json": config_json,
    }
    path = os.path.join(path_dir, filename or f"{name}_step{step:08d}.ckpt")
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    if filename is None:
        old = sorted(glob.glob(os.path.join(path_dir, f"{name}_step*.ckpt")))
        for p in old[:-max_keep]:
            os.remove(p)
    return path


def save_best(path_dir: str, name: str, payload_path: str):
    """Copy a checkpoint as the best-metric snapshot."""
    import shutil

    best = os.path.join(path_dir, f"{name}_best.ckpt")
    shutil.copyfile(payload_path, best)
    return best


def latest_checkpoint(path_dir: str, name: str) -> Optional[str]:
    cands = sorted(glob.glob(os.path.join(path_dir, f"{name}_step*.ckpt")))
    return cands[-1] if cands else None


def load_checkpoint(path: str, dt_gamma: float = 0.0):
    """`dt_gamma` picks the probe-mask flavor for the rebuilt occupancy
    state (occupancy._probe_masks): C>1 or dt_gamma>0 checkpoints get the
    per-cascade MC masks so the probe march engages after resume (distill
    mode never refreshes the inherited teacher grid, so a wrong flavor
    here would silently fall back to the slow direct-lookup march)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    from pvd_tpu.render.occupancy import _probe_masks, dilate_bitfield

    occ_d = payload["occ"]
    bitfield = jnp.asarray(occ_d["bitfield"])
    H = occ_d["density_grid"].shape[1]
    C = occ_d["density_grid"].shape[0]
    occ = OccupancyState(
        density_grid=jnp.asarray(occ_d["density_grid"]),
        bitfield=bitfield,
        bitfield_dilated=jnp.asarray(
            occ_d["bitfield_dilated"]
        ) if "bitfield_dilated" in occ_d else dilate_bitfield(bitfield, H),
        # derived, never persisted: rebuild from the bitfield
        neighbor_masks=_probe_masks(bitfield, H, C, dt_gamma),
        mean_density=jnp.float32(occ_d["mean_density"]),
        iter_density=jnp.int32(occ_d["iter_density"]),
        aabb_train=jnp.asarray(occ_d["aabb_train"]),
        aabb_infer=jnp.asarray(occ_d["aabb_infer"]),
    )
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    ema = payload.get("ema_params")
    if ema is not None:
        ema = jax.tree_util.tree_map(jnp.asarray, ema)
    return {
        "step": payload["step"],
        "params": params,
        "ema_params": ema,
        "occ": occ,
        "stats": payload.get("stats", {}),
        "config_json": payload.get("config_json"),
    }


def warm_start_student(student_params, teacher_params):
    """Teacher->student warm start (utils.py:1531-1559, strict=False): copy
    every teacher leaf whose path+shape matches the student tree — in
    practice the shared sigma_net/color_net heads transfer, the spatial
    encoders don't."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(teacher_params)[0])
    paths_t = {
        tuple(str(k) for k in path): leaf for path, leaf in flat_t.items()
    }

    def maybe_copy(path, leaf):
        key = tuple(str(k) for k in path)
        src = paths_t.get(key)
        if src is not None and src.shape == leaf.shape:
            return src
        return leaf

    return jax.tree_util.tree_map_with_path(maybe_copy, student_params)
