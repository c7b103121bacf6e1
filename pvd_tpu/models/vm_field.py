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

from functools import partial
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


def _plane_line_prod(mat, vec, xn, i: int):
    """[N, R] plane*line product for branch i (stop-gradient coords)."""
    m0, m1 = MAT_IDS[i]
    v = VEC_IDS[i]
    xn = jax.lax.stop_gradient(xn)
    H, W, _ = mat.shape
    px = (xn[:, m0] + 1.0) * 0.5 * (W - 1)
    py = (xn[:, m1] + 1.0) * 0.5 * (H - 1)
    mf = _plane_packed_mxu(mat, px, py)
    L = vec.shape[0]
    pz = (xn[:, v] + 1.0) * 0.5 * (L - 1)
    vf = _line_mxu(vec, pz)
    return mf * vf


def sigma_feat(params, xn):
    """[N] raw sigma feature: sum over ranks and branches."""
    out = 0.0
    for i in range(3):
        prod = _plane_line_prod(params["sigma_mat"][i],
                                params["sigma_vec"][i], xn, i)
        out = out + prod @ jnp.ones((prod.shape[1], 1), prod.dtype)
    return out[:, 0]


def color_feat(params, spec: ModelSpec, xn):
    """[N, geo_feat_dim] via the basis matrix over concatenated products."""
    Rc = spec.vm_color_rank
    out = 0.0
    for i in range(3):
        prod = _plane_line_prod(params["color_mat"][i],
                                params["color_vec"][i], xn, i)
        out = out + prod @ params["basis_mat"]["w"][i * Rc : (i + 1) * Rc]
    return out


def _line_mxu(vec, p):
    """Linear line sample as ONE one-hot matmul: [N] x [L, R] -> [N, R].

    The line tables are tiny (<=300 rows), so a [N, L] two-nonzero matrix
    on the MXU beats a row gather (measured: the gather engine charges per
    row; the matmul is FLOP-free at this size) — and its backward is another
    matmul instead of a scatter.
    """
    L = vec.shape[0]
    b = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, max(L - 2, 0))
    f = (p - b.astype(p.dtype))[:, None]
    ar = jnp.arange(L, dtype=jnp.int32)[None, :]
    W = jnp.where(ar == b[:, None], 1.0 - f, 0.0) + jnp.where(
        ar == b[:, None] + 1, f, 0.0
    )  # [N, L]
    return W @ vec


def _plane_packed_mxu(mat, px, py):
    """Bilinear plane sample: FOUR shifted row gathers + corner-major sum.

    Device-traced on v5e (round 3): the previous formulation — build a
    [H*W, 4R] neighborhood-packed table in-graph, gather one wide row per
    point — spent 0.57 ms/branch building the pack (a full-table lane
    concat) vs 0.10 ms for its gather; gathering the 4 corner rows
    DIRECTLY from the flat [H*W, R] table costs 0.28 ms/branch total (the
    4 shifted index streams hit nearly identical rows, so the gather
    engine runs far above its random-row rate), and the backward becomes
    one wide scatter + lane folds (see _plane_sample4_bwd).
    Corner-major [4, N, R] keeps every reshape a major-dim split (lane
    repacks halve TPU gather thoughput, ops/hashgrid.py notes).
    """
    from pvd_tpu.ops.packing import packed_base, tent_weights_1d

    H, W, R = mat.shape
    bx = packed_base(px, W)  # <= W-2, so bx+1 stays in row range
    by = packed_base(py, H)
    i = by * W + bx
    wx = tent_weights_1d(px, bx, W)  # [N, 2]
    wy = tent_weights_1d(py, by, H)
    w4 = jnp.stack(
        [wy[:, 0] * wx[:, 0], wy[:, 0] * wx[:, 1],
         wy[:, 1] * wx[:, 0], wy[:, 1] * wx[:, 1]],
        axis=0,
    )  # [4, N], corner order (dx, dy) bits
    return _plane_sample4(mat.reshape(H * W, R), i, w4, W)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _plane_sample4(v, i, w4, W: int):
    """out[n] = sum_k w4[k, n] * v[i_n + off_k], off = (0, 1, W, W+1)."""
    R = v.shape[1]
    rows = jnp.concatenate([i, i + 1, i + W, i + W + 1], axis=0)  # [4N]
    vals = jnp.take(v, rows, axis=0, mode="clip").reshape(4, -1, R)
    return jnp.sum(vals * w4[..., None].astype(vals.dtype), axis=0)  # [N, R]


def _plane_sample4_fwd(v, i, w4, W):
    return _plane_sample4(v, i, w4, W), (v, i, w4)


def _plane_sample4_bwd(W, res, g):
    """Table grad via a dy-split 2N-row scatter + ONE shifted lane fold.

    The two dx-corners of each dy row pack into one [N, 2R] update (2R=128
    = exactly one TPU lane register), scattered at rows i (dy=0) and i+W
    (dy=1) in a single 2N-row call; the dx=1 half then folds back with one
    off=1 row shift.  tools/micro_plane.py on v5e (N=24576, R=64):
    1.225 ms vs 1.540 for the previous [N, 4R]-wide N-row scatter + three
    shifted folds — the off=1 / off=W+1 folds on an R=64-minor array are
    lane rotations (half a register), which cost more than the extra N
    update rows.  Exact (max|d| 1e-6 vs the 4-fold form).
    """
    v, i, w4 = res
    HW, R = v.shape
    g = g.astype(v.dtype)
    u0 = jnp.concatenate([w4[0][:, None] * g, w4[1][:, None] * g], axis=1)
    u1 = jnp.concatenate([w4[2][:, None] * g, w4[3][:, None] * g], axis=1)
    rows = jnp.concatenate([i, i + W], axis=0)
    u = jnp.concatenate([u0, u1], axis=0)  # [2N, 2R]
    scratch = jnp.zeros((HW, 2 * R), v.dtype).at[rows].add(u, mode="drop")
    g_v = scratch[:, :R] + jnp.pad(scratch[: HW - 1, R:], ((1, 0), (0, 0)))
    # w4 cotangent: ALWAYS dead here — every caller stop-gradients the
    # sample coordinates (module docstring), so w4 carries no grad path.
    # Returning zeros instead of the honest re-gather saves a second
    # 4N-row corner gather per branch in the backward (XLA did NOT prune
    # the re-gather: the forward plane fetch traced at ~2x its cost
    # before this).  If positions ever become trainable, restore
    # vals = take(v, rows); g_w4 = sum(vals * g, -1).
    g_w4 = jnp.zeros_like(w4)
    return g_v, None, g_w4


_plane_sample4.defvjp(_plane_sample4_fwd, _plane_sample4_bwd)


def _joint_feats(params, spec: ModelSpec, xn):
    """Sigma and color features with FUSED plane/line fetches.

    The sigma and color factorizations share resolutions and query
    coordinates, so their packed tables are channel-concatenated per branch
    and fetched with ONE gather per (branch, point) — half the row count of
    querying them separately (the TPU gather engine is row-rate-bound).
    Sigma-rank summation and the per-branch basis projection fold into one
    [R, 1+geo] matmul per branch, so no lane slicing ever touches the
    gathered values.
    """
    xn = jax.lax.stop_gradient(xn)
    Rs = spec.vm_sigma_rank
    Rc = spec.vm_color_rank
    geo = params["basis_mat"]["w"].shape[1]
    sigma_color = 0.0
    # NOTE: a "batched" variant (stack the 3 branch planes, one pack chain,
    # one branch-offset gather) measured 2x SLOWER on v5e — the [3,H,W,C]
    # pad/concat layout and the 3x-taller gather table both lose to three
    # independent per-branch chains. Keep them separate.
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
        mf = _plane_packed_mxu(mat, px, py)  # [N, R]
        L = vec.shape[0]
        pz = (xn[:, v] + 1.0) * 0.5 * (L - 1)
        vf = _line_mxu(vec, pz)  # [N, R]
        prod = mf * vf  # [N, Rs + Rc]
        # one matmul projects this branch to [sigma | geo-color]: rows
        # 0..Rs-1 sum into channel 0, rows Rs.. apply this branch's slice
        # of the (trained) basis matrix
        basis_i = params["basis_mat"]["w"][i * Rc : (i + 1) * Rc]  # [Rc, geo]
        P = jnp.concatenate(
            [
                jnp.concatenate(
                    [jnp.ones((Rs, 1), prod.dtype),
                     jnp.zeros((Rs, geo), prod.dtype)], axis=1),
                jnp.concatenate(
                    [jnp.zeros((Rc, 1), prod.dtype), basis_i], axis=1),
            ],
            axis=0,
        )  # [R, 1 + geo]
        sigma_color = sigma_color + prod @ P
    return sigma_color[:, 0], sigma_color[:, 1:]


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
