"""Fixed-count stratified sampling and inverse-CDF importance sampling.

The shape-static sampler behind the non-occupancy render path (reference
`NeRFRenderer.run`, distill_mutual/renderer.py:139-317, and `sample_pdf`,
renderer.py:15-51).  This formulation is already TPU-ideal: everything is a
dense [n_rays, n_steps] tensor program.
"""

import jax
import jax.numpy as jnp


def stratified_z_vals(rng, nears, fars, num_steps: int, perturb: bool):
    """Linspace in [near, far] per ray, optionally jittered by +-0.5 bins.

    nears/fars: [N]. Returns z_vals [N, num_steps], sample_dist [N, 1].
    """
    nears = nears[..., None]
    fars = fars[..., None]
    u = jnp.linspace(0.0, 1.0, num_steps)[None, :]
    z = nears + (fars - nears) * u
    sample_dist = (fars - nears) / num_steps
    if perturb:
        noise = jax.random.uniform(rng, z.shape) - 0.5
        z = z + noise * sample_dist
    return z, sample_dist


def sample_pdf(rng, bins, weights, n_samples: int, det: bool = False):
    """Inverse-CDF sampling of new z values (NeRF hierarchical sampling).

    bins: [N, T] (z midpoints), weights: [N, T-1]. Returns [N, n_samples].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, T]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
