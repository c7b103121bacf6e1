"""Shared sigma/color MLP heads used by the hash and mlp architectures.

The shared heads are the lynchpin of any-to-any distillation: every
architecture that has an MLP tail routes its spatial encoding through the
same 2x64 sigma_net -> (1+15) and 3x64 color_net -> RGB (network.py:103-152),
so teacher/student MLP-head weights transfer at warm-start.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from pvd_tpu.config import ModelSpec
from pvd_tpu.models.common import apply_mlp
from pvd_tpu.ops.activation import trunc_exp
from pvd_tpu.ops.sh import sh_encode


class FieldOut(NamedTuple):
    sigma: jnp.ndarray  # [N] post trunc_exp
    rgb: Optional[jnp.ndarray]  # [N, 3] post sigmoid (None when !want_color)
    sigma_logit: jnp.ndarray  # [N] clipped pre-activation
    fea_sc: Optional[jnp.ndarray]  # [N, 1+geo_feat] or None (tensors)


def shared_sigma_color(params, spec: ModelSpec, enc, d, want_color: bool) -> FieldOut:
    """The hash/mlp tail: sigma_net -> (sigma, geo_feat) -> color_net.

    Reference behavior (network.py:410-436): channel 0 of the sigma_net
    output is clipped to [sigma_clip_min, sigma_clip_max]; the clipped tensor
    is the distillation feature; stage 1 stops before any color work.
    """
    cdt = jnp.dtype(spec.compute_dtype)
    h = apply_mlp(params["sigma_net"], enc.astype(cdt)).astype(jnp.float32)
    s = jnp.clip(h[..., 0], spec.sigma_clip_min, spec.sigma_clip_max)
    h = jnp.concatenate([s[..., None], h[..., 1:]], axis=-1)
    fea_sc = h
    sigma_logit = s
    if not want_color:
        return FieldOut(trunc_exp(sigma_logit), None, sigma_logit, fea_sc)
    sigma = trunc_exp(sigma_logit)
    geo = h[..., 1:]
    enc_d = sh_encode(d, spec.dir_sh_degree)
    rgb = apply_mlp(
        params["color_net"],
        jnp.concatenate([enc_d, geo], axis=-1).astype(cdt),
        final_activation="sigmoid",
    ).astype(jnp.float32)
    return FieldOut(sigma, rgb, sigma_logit, fea_sc)


def shared_density(params, spec: ModelSpec, enc):
    """Density-only tail.  Quirk kept from network.py:481-489: the density
    path clips ALL channels (the forward path clips only channel 0)."""
    h = apply_mlp(params["sigma_net"], enc)
    h = jnp.clip(h, spec.sigma_clip_min, spec.sigma_clip_max)
    return trunc_exp(h[..., 0])
