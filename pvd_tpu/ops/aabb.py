"""Ray/AABB intersection and background-sphere polar coordinates.

Vectorized jnp equivalents of the per-ray CUDA kernels
(raymarching.cu:93-158 `near_far_from_aabb`, :164-211 `polar_from_ray`):
a slab test with a `min_near` floor, where misses map both near and far to
FLT_MAX so downstream sampling produces zero valid samples for those rays.
"""

import numpy as np
import jax.numpy as jnp

FLT_MAX = np.float32(3.402823466e38)  # plain constant: no backend init at import


def near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2):
    """Slab-test ray/AABB intersection.

    Args:
      rays_o, rays_d: [..., 3] float32.
      aabb: [6] (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: lower bound applied to the entry distance.

    Returns:
      nears, fars: [...] float32; both FLT_MAX when the ray misses the box.
    """
    rays_o = jnp.asarray(rays_o, jnp.float32)
    rays_d = jnp.asarray(rays_d, jnp.float32)
    inv_d = 1.0 / rays_d  # IEEE inf for axis-parallel rays is fine
    lo = (aabb[:3] - rays_o) * inv_d
    hi = (aabb[3:] - rays_o) * inv_d
    t_lo = jnp.minimum(lo, hi)
    t_hi = jnp.maximum(lo, hi)
    near = jnp.max(t_lo, axis=-1)
    far = jnp.min(t_hi, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, FLT_MAX, near)
    far = jnp.where(miss, FLT_MAX, far)
    return near, far


def polar_from_ray(rays_o, rays_d, radius):
    """Ray ∩ sphere(radius) -> (theta, phi) in [-1, 1]^2 for the bg model."""
    rays_o = jnp.asarray(rays_o, jnp.float32)
    rays_d = jnp.asarray(rays_d, jnp.float32)
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = jnp.sum(rays_o * rays_d, axis=-1)  # actually B/2
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    t = (-b + jnp.sqrt(jnp.maximum(b * b - a * c, 0.0))) / a
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)  # [-pi, pi)
    inv_pi = 1.0 / jnp.pi
    return jnp.stack([2.0 * theta * inv_pi - 1.0, phi * inv_pi], axis=-1)
