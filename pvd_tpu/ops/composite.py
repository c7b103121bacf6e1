"""Masked alpha compositing over padded sample tensors.

TPU-native replacement for the composite_rays_train forward/backward CUDA
kernels (raymarching.cu:504-697) and the inference accumulator
(raymarching.cu:825-918).  Instead of per-ray sequential loops over ragged
CSR slices, samples live in dense [n_rays, S] tensors with a validity mask;
transmittance is an exclusive cumulative product and all gradients come from
autodiff (the reference's closed-form backward is exactly the derivative of
this expression).

Semantics matched to the reference:
  * alpha_i = 1 - exp(-sigma_i * delta_i)        (deltas channel 0)
  * weight_i = alpha_i * prod_{j<i} (1 - alpha_j)
  * depth accumulates the *cumulative* real delta (deltas channel 1):
      d = sum_i w_i * sum_{j<=i} delta1_j
    where delta1 includes skipped empty space (raymarching.cu:557-558).
  * training composits every valid sample (no early exit); inference zeroes
    contributions once transmittance-before-sample < 1e-4
    (raymarching.cu:886-888).
"""

import jax.numpy as jnp

T_EPS = 1e-4  # inference early-termination threshold


def exclusive_cumprod_one_minus(alphas):
    """T_i = prod_{j<i} (1 - alpha_j), computed as a shifted cumprod."""
    om = 1.0 - alphas
    cp = jnp.cumprod(om, axis=-1)
    return jnp.concatenate([jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1)


def composite_rays(sigmas, rgbs, delta_t, delta_depth, mask, early_stop: bool = False):
    """Composite padded per-ray samples.

    Args:
      sigmas: [N, S] densities (already density_scale-multiplied).
      rgbs: [N, S, 3].
      delta_t: [N, S] integration step of each sample (deltas channel 0).
      delta_depth: [N, S] real marched distance of each sample (channel 1).
      mask: [N, S] bool validity.
      early_stop: apply the inference T < 1e-4 cutoff.

    Returns:
      weights_sum [N], depth [N], image [N, 3], weights [N, S].
    """
    m = mask.astype(sigmas.dtype)
    alphas = (1.0 - jnp.exp(-sigmas * delta_t)) * m
    trans = exclusive_cumprod_one_minus(alphas)
    if early_stop:
        alphas = jnp.where(trans < T_EPS, 0.0, alphas)
        # transmittance itself is unchanged for kept samples
    weights = alphas * trans  # [N, S]

    t_cum = jnp.cumsum(delta_depth * m, axis=-1)  # [N, S]
    weights_sum = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * t_cum, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    return weights_sum, depth, image, weights


def composite_stratified(sigmas, z_vals, sample_dist, rgbs):
    """Compositing for the fixed-count stratified path (renderer.py:257-295).

    sigmas: [N, T]; z_vals: [N, T]; sample_dist: [N, 1]; rgbs: [N, T, 3].
    Returns weights_sum [N], weights [N, T], image [N, 3].
    """
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)], axis=-1
    )
    alphas = 1.0 - jnp.exp(-deltas * sigmas)
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-15], axis=-1
    )
    weights = alphas * jnp.cumprod(shifted, axis=-1)[..., :-1]
    weights_sum = jnp.sum(weights, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    return weights_sum, weights, image
