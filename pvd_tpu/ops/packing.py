"""Neighborhood packing: turn k-corner interpolation into ONE row gather.

Motivation (measured on v5e): XLA's TPU gather engine is rate-limited per
ROW (~160M rows/s for narrow rows), not per byte, so fetching the 2^D
interpolation corners of a point as 2^D separate rows wastes most of the
machine.  Packing the 2^D-corner neighborhood of every cell into a single
wide row divides the gather count by 2^D at the cost of one vectorized
(shift + concat) pass over the table per step.

Crucially the packed table is BUILT INSIDE the differentiable graph from the
canonical (unpacked) parameters, so the parameterization — and checkpoint
compatibility — is unchanged: autodiff turns the packing into cheap shifted
pad-adds, which also shrinks the backward scatter by 2^D.

Weights use the tent formulation w(corner c) = max(0, 1 - |p - c|), which is
exactly bilinear/trilinear interpolation with zero padding (torch
grid_sample padding_mode='zeros') evaluated in packed-cell space.
"""

from __future__ import annotations

import jax.numpy as jnp


def flat_take(table, idx):
    """Row gather with a FLATTENED index.

    Measured on v5e: `jnp.take(table, idx_2d, axis=0)` runs the TPU gather
    engine at ~89M rows/s while the identical gather with a flat 1-D index
    runs at ~230M rows/s.  Every hot-path row gather must go through here.
    """
    out = jnp.take(table, idx.reshape(-1), axis=0)
    return out.reshape(idx.shape + table.shape[1:])


def pack_rows_3d(rows, side: int, C: int):
    """Pack x-fastest dense rows [side^3, C] -> [side^3, 8*C].

    packed[z*s^2 + y*s + x, k*C:(k+1)*C] = rows[(z+dz)*s^2 + (y+dy)*s + (x+dx)]
    with corner bit order k = dx + 2*dy + 4*dz (the hash-grid corner order).
    Out-of-range neighbors (at the far faces) are zero.
    """
    s = side
    vol = rows[: s * s * s].reshape(s, s, s, C)  # [z, y, x, C]
    padded = jnp.pad(vol, ((0, 1), (0, 1), (0, 1), (0, 0)))
    parts = []
    for k in range(8):
        dx, dy, dz = k & 1, (k >> 1) & 1, (k >> 2) & 1
        parts.append(padded[dz : dz + s, dy : dy + s, dx : dx + s])
    return jnp.concatenate(parts, axis=-1).reshape(s * s * s, 8 * C)


def pack_plane(plane, pad_rows: int = 0):
    """[H, W, C] -> [H*W, 4*C] with corners ordered (dx, dy) bits (bit0=x).

    packed[y*W + x] = concat(v[y,x], v[y,x+1], v[y+1,x], v[y+1,x+1]);
    far-edge neighbors are zero.

    Formulated entirely in FLAT 2-D [H*W, C] shifts: the 3-D pad/slice/concat
    version made XLA materialize {1,2,0}->{2,1,0} layout-transpose copies of
    the full packed table (traced at 3.5 ms/step for the VM student's three
    300x300x256 branch packs on v5e); row-shifts of the flat array plus a
    boundary mask produce the identical table with plain {1,0} layouts.
    """
    H, W, C = plane.shape
    v = plane.reshape(H * W, C)
    zrow = jnp.zeros((1, C), v.dtype)
    zrows = jnp.zeros((W, C), v.dtype)
    # x+1 neighbor: shift rows by 1, zero where x == W-1
    mx = jnp.asarray(
        (jnp.arange(H * W) % W) != (W - 1), v.dtype)[:, None]
    vx = jnp.concatenate([v[1:], zrow], axis=0) * mx
    # y+1 neighbor: shift rows by W, zero rows where y == H-1 (the shifted
    # tail is already zero-padded)
    vy = jnp.concatenate([v[W:], zrows], axis=0)
    vxy = jnp.concatenate([vx[W:], zrows], axis=0)
    return jnp.concatenate([v, vx, vy, vxy], axis=-1)


def pack_plane_batch(planes):
    """[B, H, W, C] -> [B*H*W, 4*C]: pack_plane over a leading batch in ONE
    pad/slice/concat chain (3x fewer XLA ops than per-plane packing)."""
    B, H, W, C = planes.shape
    padded = jnp.pad(planes, ((0, 0), (0, 1), (0, 1), (0, 0)))
    parts = []
    for k in range(4):
        dx, dy = k & 1, (k >> 1) & 1
        parts.append(padded[:, dy : dy + H, dx : dx + W])
    return jnp.concatenate(parts, axis=-1).reshape(B * H * W, 4 * C)


def pack_line(line):
    """[L, C] -> [L, 2*C]: packed[i] = concat(v[i], v[i+1])."""
    L, C = line.shape
    padded = jnp.pad(line, ((0, 1), (0, 0)))
    return jnp.concatenate([padded[:L], padded[1 : L + 1]], axis=-1)


def tent_weights_1d(p, base, size: int):
    """Tent (zero-padded linear) weights for packed slots (base, base+1).

    p: [N] continuous positions in grid units; base: [N] int32 packed-cell
    index (clamped to [0, size-2]). Returns w [N, 2].
    """
    c0 = base.astype(p.dtype)
    w0 = jnp.maximum(0.0, 1.0 - jnp.abs(p - c0))
    w1 = jnp.maximum(0.0, 1.0 - jnp.abs(p - (c0 + 1.0)))
    # zero out corners outside the true grid (c0 >= 0 by clamping; c0+1 can
    # exceed size-1 only if size == 1)
    return jnp.stack([w0, w1], axis=-1)


def packed_base(p, size: int):
    """Clamped packed-cell index for a continuous position p (grid units)."""
    return jnp.clip(jnp.floor(p).astype(jnp.int32), 0, max(size - 2, 0))


def sample_packed_plane(packed, H: int, W: int, C: int, px, py):
    """Bilinear zero-padded sample via ONE gather per point.

    packed: [H*W, 4C] from pack_plane; px, py: [N] positions in grid units
    (align_corners=True unnormalized). Returns [N, C].
    """
    bx = packed_base(px, W)
    by = packed_base(py, H)
    rows = jnp.take(packed, by * W + bx, axis=0)  # [N, 4C]
    wx = tent_weights_1d(px, bx, W)  # [N, 2]
    wy = tent_weights_1d(py, by, H)
    # corner k = dx + 2*dy
    w = jnp.stack(
        [wy[:, 0] * wx[:, 0], wy[:, 0] * wx[:, 1],
         wy[:, 1] * wx[:, 0], wy[:, 1] * wx[:, 1]],
        axis=-1,
    )  # [N, 4]
    vals = rows.reshape(-1, 4, C)
    return jnp.sum(vals * w[..., None].astype(vals.dtype), axis=1)


def sample_packed_line(packed, L: int, C: int, p):
    """Linear zero-padded sample via one gather per point. Returns [N, C]."""
    b = packed_base(p, L)
    rows = jnp.take(packed, b, axis=0).reshape(-1, 2, C)
    w = tent_weights_1d(p, b, L)
    return jnp.sum(rows * w[..., None].astype(rows.dtype), axis=1)
