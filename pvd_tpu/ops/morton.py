"""Morton (Z-order) 3D codes as pure jnp integer ops.

Used for checkpoint interop with the reference (whose density grid is stored
in Morton order, raymarching.cu:58-83) and for the occupancy-grid resample
path.  Internally pvd_tpu keeps grids in row-major [H, H, H] layout, which is
gather-friendlier on TPU; these ops are the translation layer.
"""

import jax.numpy as jnp


def _expand_bits(v):
    v = jnp.asarray(v, jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """coords: [..., 3] int in [0, 1024). Returns [...] uint32 Morton codes."""
    coords = jnp.asarray(coords, jnp.uint32)
    xx = _expand_bits(coords[..., 0])
    yy = _expand_bits(coords[..., 1])
    zz = _expand_bits(coords[..., 2])
    return xx | (yy << 1) | (zz << 2)


def _compact_bits(x):
    x = jnp.asarray(x, jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes):
    """codes: [...] uint32. Returns [..., 3] int32 (x, y, z)."""
    codes = jnp.asarray(codes, jnp.uint32)
    x = _compact_bits(codes)
    y = _compact_bits(codes >> 1)
    z = _compact_bits(codes >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
