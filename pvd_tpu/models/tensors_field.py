"""Plenoxels architecture (reference model_type == 'tensors').

One dense feature volume [1 + 3*deg^2, X, Y, Z] queried by trilinear
interpolation; channel 0 is the sigma logit, the rest are per-channel SH
coefficients dotted with the SH encoding of the view direction — no MLP at
all (network.py:91-96, 184-191, 311-322, 383-409).  fea_sc is None: this
architecture has no separable feature, which is why distillation stage 1 is
disabled whenever either side is 'tensors' (main_distill_mutual.py:243-246).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec
from pvd_tpu.models.heads import FieldOut
from pvd_tpu.ops.activation import trunc_exp
from pvd_tpu.ops.grid_sample import grid_sample_3d
from pvd_tpu.ops.sh import sh_encode


def init(rng, spec: ModelSpec, s: float = 0.02):
    """Gaussian init, std 0.02 (main_just_train_tea via network.py:184-191).

    Layout is channels-minor [D, H, W, C] (the torch reference uses
    [1, C, D, H, W]); feature channels stay lane-contiguous for row gathers.
    """
    res = spec.plenoxel_res
    vol = s * jax.random.normal(
        rng, (res[0], res[1], res[2], spec.plenoxel_fea_dim), jnp.float32
    )
    return {"volume": vol}


def _normalize(x, aabb):
    return 2.0 * (x - aabb[:3]) / (aabb[3:] - aabb[:3]) - 1.0


def _query(params, xn):
    # world (x, y, z) index volume dims (W, H, D) = (res[2], res[1], res[0]),
    # matching torch grid_sample's coordinate order on the reference volume
    return grid_sample_3d(params["volume"], xn)  # [N, C]


def forward(params, spec: ModelSpec, x, d, aabb, want_color: bool):
    xn = _normalize(x, aabb)
    h = _query(params, xn)
    s = jnp.clip(h[..., 0], spec.sigma_clip_min, spec.sigma_clip_max)
    sigma = trunc_exp(s)
    # Plenoxels always produce color (they skip stage 1 entirely).
    sh_coef = h[..., 1:].reshape(-1, 3, spec.plenoxel_degree**2)
    enc_d = sh_encode(d, spec.plenoxel_degree)[:, None, :]
    rgb = jax.nn.sigmoid(jnp.sum(sh_coef * enc_d, axis=-1))
    return FieldOut(sigma, rgb, s, None)


def density(params, spec: ModelSpec, x, aabb):
    xn = _normalize(x, aabb)
    h = _query(params, xn)
    # network.py:470-476 clips then immediately overwrites with the unclipped
    # logit; the effective reference behavior is an UNCLIPPED density here.
    return trunc_exp(h[..., 0])


def edit_erase_region(params, region=((None, None), (160, None), (None, 128)),
                      value: float = -100.0):
    """The enable_edit_plenoxel demo: hard-write sigma logits in a region
    (deletes the lego bucket; network.py:313-316). region indexes (D, H, W)."""
    vol = params["volume"]
    (d0, d1), (h0, h1), (w0, w1) = region
    sl = (slice(d0, d1), slice(h0, h1), slice(w0, w1), 0)
    return {**params, "volume": vol.at[sl].set(value)}


def upsample_params(params, resolution):
    """Trilinear-upsample the dense volume to `resolution` = (D, H, W).

    The plenoxels coarse-to-fine lever: the reference's progressive
    upsample machinery is VM-only (network.py:560-587), but the same
    separable align_corners=True linear resize applies to the dense
    volume — round-5 lever for the dense no-MLP student's distillation
    fit-precision gap (a volume initialized coarse fits the teacher's
    low frequencies first instead of per-voxel noise).

    Host-side like vm_field.upsample_params: returns a NEW params pytree
    with different shapes; the caller rebuilds optimizer state.
    """
    import numpy as np

    from pvd_tpu.models.vm_field import _linear_resize_2d

    vol = np.asarray(params["volume"])  # [D, H, W, C]
    D, H, W, C = vol.shape
    nD, nH, nW = int(resolution[0]), int(resolution[1]), int(resolution[2])
    v = _linear_resize_2d(vol.reshape(D, H, W * C), (nD, nH))
    v = v.reshape(nD * nH, W, C).transpose(1, 0, 2)  # [W, nD*nH, C]
    v = _linear_resize_2d(v, (nW, nD * nH)).transpose(1, 0, 2)
    out = dict(params)
    out["volume"] = jnp.asarray(v.reshape(nD, nH, nW, C), jnp.float32)
    return out
