"""Linear grid sampling (1D/2D/3D), align_corners=True, zero padding.

TPU-native replacement for the reference's use of torch.nn.functional
.grid_sample in the TensoRF-VM plane/line feature queries
(distill_mutual/network.py:216-309) and the Plenoxels volume query
(network.py:311-322).  Coordinate convention matches torch grid_sample:
values in [-1, 1], with coordinate channel 0 (x) indexing the FASTEST
spatial axis.  Out-of-range points receive zero contributions
(padding_mode='zeros').

Layout is channels-minor ([L, C], [H, W, C], [D, H, W, C]) and every corner
fetch is a ROW gather from the flattened spatial axis — channels stay
lane-contiguous, which is what the TPU gather path wants.  Gradients are
XLA gather transposes (scatter-adds); hot backward paths get custom
treatments in the model layer.
"""

import jax.numpy as jnp


def _unnormalize(coord, size):
    # align_corners=True mapping: -1 -> 0, +1 -> size-1
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample_1d(line, coords):
    """line: [L, C]; coords: [N] in [-1, 1]. Returns [N, C]."""
    L = line.shape[0]
    p = _unnormalize(jnp.asarray(coords, jnp.float32), L)
    i0 = jnp.floor(p).astype(jnp.int32)
    frac = p - i0
    out = 0.0
    for di, w in ((0, 1.0 - frac), (1, frac)):
        idx = i0 + di
        ok = ((idx >= 0) & (idx <= L - 1)).astype(line.dtype)
        rows = jnp.take(line, jnp.clip(idx, 0, L - 1), axis=0)  # [N, C]
        out = out + rows * (w * ok)[:, None]
    return out


def grid_sample_2d(plane, coords):
    """plane: [H, W, C]; coords: [N, 2] = (x, y), x->W, y->H. Returns [N, C]."""
    H, W, C = plane.shape
    flat = plane.reshape(H * W, C)
    px = _unnormalize(jnp.asarray(coords[..., 0], jnp.float32), W)
    py = _unnormalize(jnp.asarray(coords[..., 1], jnp.float32), H)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx, fy = px - x0, py - y0
    out = 0.0
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        iy = y0 + dy
        oky = (iy >= 0) & (iy <= H - 1)
        iy_c = jnp.clip(iy, 0, H - 1)
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            ix = x0 + dx
            okx = (ix >= 0) & (ix <= W - 1)
            ix_c = jnp.clip(ix, 0, W - 1)
            w = wy * wx * (oky & okx).astype(flat.dtype)
            rows = jnp.take(flat, iy_c * W + ix_c, axis=0)  # [N, C]
            out = out + rows * w[:, None]
    return out


def grid_sample_3d(volume, coords):
    """volume: [D, H, W, C]; coords: [N, 3] = (x, y, z), x->W, y->H, z->D.

    Returns [N, C].
    """
    D, H, W, C = volume.shape
    flat = volume.reshape(D * H * W, C)
    px = _unnormalize(jnp.asarray(coords[..., 0], jnp.float32), W)
    py = _unnormalize(jnp.asarray(coords[..., 1], jnp.float32), H)
    pz = _unnormalize(jnp.asarray(coords[..., 2], jnp.float32), D)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    z0 = jnp.floor(pz).astype(jnp.int32)
    fx, fy, fz = px - x0, py - y0, pz - z0
    out = 0.0
    for dz, wz in ((0, 1.0 - fz), (1, fz)):
        iz = z0 + dz
        okz = (iz >= 0) & (iz <= D - 1)
        iz_c = jnp.clip(iz, 0, D - 1)
        for dy, wy in ((0, 1.0 - fy), (1, fy)):
            iy = y0 + dy
            oky = (iy >= 0) & (iy <= H - 1)
            iy_c = jnp.clip(iy, 0, H - 1)
            for dx, wx in ((0, 1.0 - fx), (1, fx)):
                ix = x0 + dx
                okx = (ix >= 0) & (ix <= W - 1)
                ix_c = jnp.clip(ix, 0, W - 1)
                w = wz * wy * wx * (okz & oky & okx).astype(flat.dtype)
                rows = jnp.take(flat, (iz_c * H + iy_c) * W + ix_c, axis=0)
                out = out + rows * w[:, None]
    return out
