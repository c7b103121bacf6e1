"""TensoRF-VM architecture (reference model_type == 'vm').

Low-rank vector-matrix factorization: 3 planes [R, H, W] x 3 lines [R, L]
for sigma (R=16) and for color (R=48), a bias-free basis matrix 144->15, and
the shared color_net (network.py:73-90, 193-309).  Plane/line queries are
linear grid samples (align_corners=True, zero padding); gradients are XLA
scatter-adds via autodiff.

Axis convention (kept from init_one_vm, network.py:193-214) with a
TPU-friendly channels-minor layout: plane i covers dims
mat_ids[i] = ([0,1],[0,2],[1,2]) stored as [res[mat_id_1], res[mat_id_0], R];
line i covers dim vec_ids[i] = (2,1,0) stored as [res[vec_id], R].
Rank channels stay lane-contiguous so every corner fetch is a row gather.
Coordinates are the normalized x in [-1,1] after the aabb mapping
(network.py:341-346).

Progressive upsample (bilinear, align_corners=True) and occupancy-driven
shrink (crop to the density grid's bounding box, network.py:560-643) are
host-side utilities because they change parameter shapes.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec
from pvd_tpu.models.common import apply_mlp, init_linear, init_mlp, mlp_dims
from pvd_tpu.models.heads import FieldOut
from pvd_tpu.ops.activation import trunc_exp
from pvd_tpu.ops.sh import sh_encode

MAT_IDS = ((0, 1), (0, 2), (1, 2))
VEC_IDS = (2, 1, 0)


def init(rng, spec: ModelSpec, scale: float = 0.1):
    ks = jax.random.split(rng, 16)
    res = spec.vm_resolution
    params = {"sigma_mat": [], "sigma_vec": [], "color_mat": [], "color_vec": []}
    ki = 0
    for rank, prefix in ((spec.vm_sigma_rank, "sigma"), (spec.vm_color_rank, "color")):
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            v = VEC_IDS[i]
            params[f"{prefix}_mat"].append(
                scale * jax.random.normal(ks[ki], (res[m1], res[m0], rank))
            )
            params[f"{prefix}_vec"].append(
                scale * jax.random.normal(ks[ki + 1], (res[v], rank))
            )
            ki += 2
    params["basis_mat"] = init_linear(
        ks[12], 3 * spec.vm_color_rank, spec.geo_feat_dim, bias=False
    )
    params["color_net"] = init_mlp(
        ks[13],
        mlp_dims(
            spec.dir_sh_degree**2 + spec.geo_feat_dim,
            spec.hidden_dim_color,
            3,
            spec.num_layers_color,
        ),
    )
    return params


def _normalize(x, aabb):
    return 2.0 * (x - aabb[:3]) / (aabb[3:] - aabb[:3]) - 1.0


def _plane_line_feats(mats: List, vecs: List, xn):
    """Per-branch [N, R_i] plane*line products, stop-gradient coords.

    Each plane query fetches its 4 bilinear corners as ONE neighborhood-
    packed row (ops/packing.py) — the TPU gather engine is row-rate-bound,
    so this is 4x fewer gathers than corner-wise grid_sample with identical
    zero-padded semantics (tent weights).  Packed tables are rebuilt from
    the canonical parameters inside the graph, so gradients and checkpoints
    are unchanged.
    """
    from pvd_tpu.ops.packing import (
        pack_line,
        pack_plane,
        sample_packed_line,
        sample_packed_plane,
    )

    xn = jax.lax.stop_gradient(xn)
    feats = []
    for i in range(3):
        m0, m1 = MAT_IDS[i]
        v = VEC_IDS[i]
        H, W, R = mats[i].shape
        px = (xn[:, m0] + 1.0) * 0.5 * (W - 1)
        py = (xn[:, m1] + 1.0) * 0.5 * (H - 1)
        mf = sample_packed_plane(pack_plane(mats[i]), H, W, R, px, py)
        L = vecs[i].shape[0]
        pz = (xn[:, v] + 1.0) * 0.5 * (L - 1)
        vf = sample_packed_line(pack_line(vecs[i]), L, R, pz)
        feats.append(mf * vf)
    return feats


def sigma_feat(params, xn):
    """[N] raw sigma feature: sum over ranks and branches."""
    feats = _plane_line_feats(params["sigma_mat"], params["sigma_vec"], xn)
    return sum(jnp.sum(f, axis=-1) for f in feats)


def color_feat(params, spec: ModelSpec, xn):
    """[N, geo_feat_dim] via the basis matrix over concatenated products."""
    cdt = jnp.dtype(spec.compute_dtype)
    feats = _plane_line_feats(params["color_mat"], params["color_vec"], xn)
    stacked = jnp.concatenate(feats, axis=-1).astype(cdt)  # [N, 3*R_color]
    return (stacked @ params["basis_mat"]["w"].astype(cdt)).astype(jnp.float32)


def _joint_feats(params, spec: ModelSpec, xn):
    """Sigma and color features with FUSED plane/line fetches.

    The sigma and color factorizations share resolutions and query
    coordinates, so their packed tables are channel-concatenated per branch
    and fetched with ONE gather per (branch, point) — half the row count of
    querying them separately (the TPU gather engine is row-rate-bound).
    """
    from pvd_tpu.ops.packing import (
        pack_line, pack_plane, sample_packed_line, sample_packed_plane,
    )

    cdt = jnp.dtype(spec.compute_dtype)
    xn = jax.lax.stop_gradient(xn)
    Rs = spec.vm_sigma_rank
    sigma = 0.0
    color_parts = []
    for i in range(3):
        m0, m1 = MAT_IDS[i]
        v = VEC_IDS[i]
        mat = jnp.concatenate(
            [params["sigma_mat"][i], params["color_mat"][i]], axis=-1
        )
        vec = jnp.concatenate(
            [params["sigma_vec"][i], params["color_vec"][i]], axis=-1
        )
        H, W, R = mat.shape
        px = (xn[:, m0] + 1.0) * 0.5 * (W - 1)
        py = (xn[:, m1] + 1.0) * 0.5 * (H - 1)
        mf = sample_packed_plane(pack_plane(mat), H, W, R, px, py)
        L = vec.shape[0]
        pz = (xn[:, v] + 1.0) * 0.5 * (L - 1)
        vf = sample_packed_line(pack_line(vec), L, R, pz)
        prod = mf * vf  # [N, Rs + Rc]
        sigma = sigma + jnp.sum(prod[:, :Rs], axis=-1)
        color_parts.append(prod[:, Rs:])
    stacked = jnp.concatenate(color_parts, axis=-1).astype(cdt)
    color = (stacked @ params["basis_mat"]["w"].astype(cdt)).astype(jnp.float32)
    return sigma, color


def forward(params, spec: ModelSpec, x, d, aabb, want_color: bool):
    xn = _normalize(x, aabb)
    s_raw, c_raw = _joint_feats(params, spec, xn)
    s = jnp.clip(s_raw, spec.sigma_clip_min, spec.sigma_clip_max)
    c = jnp.clip(c_raw, spec.sigma_clip_min, spec.sigma_clip_max)
    fea_sc = jnp.concatenate([s[:, None], c], axis=-1)
    if not want_color:
        return FieldOut(trunc_exp(s), None, s, fea_sc)
    sigma = trunc_exp(s)
    enc_d = sh_encode(d, spec.dir_sh_degree)
    rgb = apply_mlp(
        params["color_net"],
        jnp.concatenate([enc_d, c], axis=-1).astype(jnp.dtype(spec.compute_dtype)),
        final_activation="sigmoid",
    ).astype(jnp.float32)
    return FieldOut(sigma, rgb, s, fea_sc)


def density(params, spec: ModelSpec, x, aabb):
    xn = _normalize(x, aabb)
    s = jnp.clip(sigma_feat(params, xn), spec.sigma_clip_min, spec.sigma_clip_max)
    return trunc_exp(s)


def density_l1(params):
    """Mean-|.| L1 over sigma planes and lines (network.py:548-557)."""
    loss = 0.0
    for m, v in zip(params["sigma_mat"], params["sigma_vec"]):
        loss = loss + jnp.mean(jnp.abs(m)) + jnp.mean(jnp.abs(v))
    return loss


# ---- resolution-changing host-side utilities ----------------------------


def _linear_resize_2d(arr: np.ndarray, new_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear align_corners=True resize of [H, W, R] (host numpy)."""
    H, W, R = arr.shape
    nh, nw = new_hw

    def axis_positions(n_old, n_new):
        if n_new == 1:
            return np.zeros(1), np.zeros(1, np.int64)
        p = np.arange(n_new) * (n_old - 1) / (n_new - 1)
        i0 = np.clip(np.floor(p).astype(np.int64), 0, n_old - 1)
        return p - i0, i0

    fy, y0 = axis_positions(H, nh)
    fx, x0 = axis_positions(W, nw)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    a = arr[y0][:, x0]
    b = arr[y0][:, x1]
    c = arr[y1][:, x0]
    d = arr[y1][:, x1]
    wy = fy[:, None, None]
    wx = fx[None, :, None]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    ).astype(arr.dtype)


def _linear_resize_1d(arr: np.ndarray, new_l: int) -> np.ndarray:
    """Linear align_corners=True resize of [L, R]."""
    return _linear_resize_2d(arr[:, None, :], (new_l, 1))[:, 0, :]


def upsample_params(params, resolution: Tuple[int, int, int]):
    """Bilinear-upsample all planes/lines to `resolution` (network.py:560-587).

    Host-side: returns a NEW params pytree with different shapes; the caller
    must rebuild optimizer state (the reference rebuilds its optimizer too,
    just_train_tea/utils.py:897-899).
    """
    out = dict(params)
    for prefix in ("sigma", "color"):
        mats, vecs = [], []
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            v = VEC_IDS[i]
            mats.append(
                jnp.asarray(
                    _linear_resize_2d(
                        np.asarray(params[f"{prefix}_mat"][i]),
                        (resolution[m1], resolution[m0]),
                    )
                )
            )
            vecs.append(
                jnp.asarray(
                    _linear_resize_1d(
                        np.asarray(params[f"{prefix}_vec"][i]), resolution[v]
                    )
                )
            )
        out[f"{prefix}_mat"] = mats
        out[f"{prefix}_vec"] = vecs
    return out


def shrink_params(params, aabb: np.ndarray, new_aabb: np.ndarray,
                  resolution: Tuple[int, int, int]):
    """Crop planes/lines to the occupied sub-box (network.py:589-643).

    aabb/new_aabb: [6] numpy. Returns (new_params, tl, br) where tl/br are
    the integer crop bounds per axis.
    """
    reso = np.asarray(resolution, np.int64)
    units = (aabb[3:] - aabb[:3]) / reso
    tl = np.clip(np.round((new_aabb[:3] - aabb[:3]) / units).astype(np.int64), 0, None)
    br = np.minimum(np.round((new_aabb[3:] - aabb[:3]) / units).astype(np.int64), reso)

    out = dict(params)
    for prefix in ("sigma", "color"):
        mats, vecs = [], []
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            v = VEC_IDS[i]
            mats.append(params[f"{prefix}_mat"][i][tl[m1]:br[m1], tl[m0]:br[m0], :])
            vecs.append(params[f"{prefix}_vec"][i][tl[v]:br[v], :])
        out[f"{prefix}_mat"] = mats
        out[f"{prefix}_vec"] = vecs
    return out, tl, br
