"""Occupancy-grid state and maintenance.

TPU-native redesign of the reference's density grid machinery
(distill_mutual/renderer.py:555-775):

  * grids are row-major [CAS, H, H, H] (the reference is Morton-ordered to
    match its bitfield kernel; row-major is gather-friendlier on TPU and the
    Morton permutation only matters for checkpoint interop, see ops/morton).
  * the uint8 bitfield becomes a bool grid (a packed uint32 view is derived
    where kernels want it).
  * "sample random occupied cells" (renderer.py:704-744) is done with an
    inverse-CDF draw over the occupancy mask's cumsum instead of
    nonzero()+randint, keeping shapes static.
  * everything is jit-friendly; `full` (first-16-updates full sweep) is a
    static flag chosen by the host trainer from iter_density.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from pvd_tpu.config import RenderSpec


@struct.dataclass
class OccupancyState:
    density_grid: jnp.ndarray  # [CAS, H, H, H] f32; -1 marks untrained cells
    bitfield: jnp.ndarray  # [CAS * H^3] bool, flat row-major
    bitfield_dilated: jnp.ndarray  # [CAS * H^3] bool, 2-cell max-dilation
    # [H^3, NB_WORDS] uint32 (single-cascade) or [C*H^3 + 1, MC_WORDS]
    # (multi-cascade/dt_gamma>0, zero sentinel row appended): bit
    # (dz+R)*side^2+(dy+R)*side+(dx+R) of row (x*H+y)*H+z holds the
    # occupancy of cell (x+dx, y+dy, z+dz) — ONE gather resolves a whole
    # (2R+1)^3 neighborhood for the probe-based marcher
    # (renderer.march_rays)
    neighbor_masks: jnp.ndarray
    mean_density: jnp.ndarray  # scalar f32
    iter_density: jnp.ndarray  # scalar i32
    aabb_train: jnp.ndarray  # [6]
    aabb_infer: jnp.ndarray  # [6]


# Probe-mask geometry.  Radius 4 (9^3 = 729 bits) packs into 23 uint32
# words, PADDED to 32 (128B power-of-2 rows): the v5e gather engine runs
# power-of-2 row widths 16B-256B at the full ~193-210M rows/s even from
# 4M-row tables, while a non-power-of-2 48B row measured 46M rows/s
# (micro-benchmarked 2026-08-19).  Rows are charged per ROW, not per
# byte, so widening the neighborhood from 5^3 (radius 2) to 9^3 cuts
# gathered rows ~2x at the same per-row cost:
#  - single-cascade probe march: stride clamps at half-span <= R cells
#    -> stride 32 instead of 16 at the default 1024-step lattice;
#  - MC march: 1 step moves <= sqrt(3) cells in the selected mip's frame
#    (raymarching.cu:44-56 bounds dt by the mip cell, x sqrt(3) at the
#    top mip), so +-2 steps stay within floor-delta 4 -> a 5-point
#    window per probe instead of 3.
NEIGHBOR_RADIUS = 4
NB_WORDS = 32
MC_NEIGHBOR_RADIUS = 4
MC_WORDS = 32


def _shifted_grid(g, axis_shifts):
    """g [..., X, Y, Z] shifted so out[x,y,z] = g[x+dx, y+dy, z+dz] (zero
    padded); leading batch dims untouched."""
    nb = g.ndim - 3
    out = g
    for ax3, s in enumerate(axis_shifts):
        axis = nb + ax3
        H = g.shape[axis]
        if s == 0:
            continue
        pad = [(0, 0)] * g.ndim
        sl = [slice(None)] * g.ndim
        if s > 0:
            pad[axis] = (0, s)
            sl[axis] = slice(s, H + s)
        else:
            pad[axis] = (-s, 0)
            sl[axis] = slice(0, H)
        out = jnp.pad(out, pad)[tuple(sl)]
    return out


def _pack_neighborhood(g, R: int, nwords: int):
    """Pack each cell's (2R+1)^3-neighborhood occupancy into uint32 words.

    g: bool [..., X, Y, Z]; returns uint32 [..., X, Y, Z, nwords] where
    bit (dz+R)*side^2+(dy+R)*side+(dx+R) of cell (x,y,z) holds
    g[x+dx, y+dy, z+dz] (zero outside).

    Built SEPARABLY — x-strips (side shift-ORs on the bool grid), then
    y-planes (side shifted word placements), then z-rows (side x
    plane-words placements) — ~3(2R+1) + (2R+1)*ceil(side^2/32) word
    passes instead of the (2R+1)^3 single-bit passes of the naive
    builder: ~70 vs 729 at R=4.  Pure VPU work, paid only at occupancy
    updates.
    """
    side = 2 * R + 1
    assert side <= 32, "x-strip must fit one uint32 word"

    def _or(acc, v):
        return v if acc is None else acc | v

    # x-strips: bits (dx+R) in one word
    s = None
    for dx in range(-R, R + 1):
        t = _shifted_grid(g, (dx, 0, 0)).astype(jnp.uint32)
        s = _or(s, t << jnp.uint32(dx + R))
    # y-planes: side strips at side-bit offsets -> side^2 bits
    # (a spilled strip's top bit stays < side^2, so no plane word past
    # index nwp-1 is ever written — same argument one level up for rows)
    nwp = (side * side + 31) // 32
    planes = [None] * nwp
    for dy in range(-R, R + 1):
        off = (dy + R) * side
        w, sh = off // 32, off % 32
        t = _shifted_grid(s, (0, dy, 0))
        planes[w] = _or(planes[w], t << jnp.uint32(sh) if sh else t)
        if sh and sh + side > 32:
            planes[w + 1] = _or(planes[w + 1], t >> jnp.uint32(32 - sh))
    # z-rows: side planes at side^2-bit offsets -> side^3 bits
    words = [None] * nwords
    for dz in range(-R, R + 1):
        off_z = (dz + R) * side * side
        for j in range(nwp):
            if planes[j] is None:
                continue
            t = _shifted_grid(planes[j], (0, 0, dz))
            o = off_z + 32 * j
            w, sh = o // 32, o % 32
            used = min(32, side * side - 32 * j)
            words[w] = _or(words[w], t << jnp.uint32(sh) if sh else t)
            if sh and sh + used > 32:
                words[w + 1] = _or(words[w + 1], t >> jnp.uint32(32 - sh))
    zero = jnp.zeros(g.shape, jnp.uint32)
    return jnp.stack([zero if w is None else w for w in words], axis=-1)


@partial(jax.jit, static_argnums=(1,))
def build_neighbor_masks(bitfield, H: int):
    """Pack each cell's 9^3-neighborhood occupancy into NB_WORDS uint32.

    Single-cascade only (the exact probe marcher's domain); multi-cascade
    scenes get a [1, NB_WORDS] zero placeholder.  Jitted: eagerly the
    separable packer's ~200 primitives each pay their own
    dispatch/compile through a remote-TPU tunnel.
    """
    C = bitfield.shape[0] // (H * H * H)
    if C != 1:
        return jnp.zeros((1, NB_WORDS), jnp.uint32)
    g = bitfield.reshape(H, H, H)
    return _pack_neighborhood(g, NEIGHBOR_RADIUS, NB_WORDS).reshape(
        H * H * H, NB_WORDS)


@partial(jax.jit, static_argnums=(1,))
def build_neighbor_masks_mc(bitfield, H: int):
    """Pack 9^3-neighborhood occupancy per cascade: [C*H^3+1, MC_WORDS].

    The multi-cascade / dt_gamma>0 probe marcher's table (renderer.
    _probe_march_occ_mc): bit (dz+R)*side^2+(dy+R)*side+(dx+R) of row
    cas*H^3 + (x*H+y)*H+z holds cascade `cas`'s occupancy of cell
    (x+dx, y+dy, z+dz) — the same layout as the single-cascade masks,
    batched over cascades.  The final row is an all-zero sentinel so the
    flavor stays shape-distinguishable at C == 1 (see MC_WORDS note).
    """
    C = bitfield.shape[0] // (H * H * H)
    g = bitfield.reshape(C, H, H, H)
    masks = _pack_neighborhood(g, MC_NEIGHBOR_RADIUS, MC_WORDS).reshape(
        C * H * H * H, MC_WORDS)
    return jnp.concatenate(
        [masks, jnp.zeros((1, MC_WORDS), jnp.uint32)], axis=0)


@partial(jax.jit, static_argnums=(1, 2))
def dilate_bitfield(bitfield, H: int, radius: int = 2):
    """Max-dilate the occupancy field by `radius` cells per axis (separable
    shifts) — the conservative coarse field for two-stage marching."""
    C = bitfield.shape[0] // (H * H * H)
    g = bitfield.reshape(C, H, H, H)
    for axis in (1, 2, 3):
        acc = g
        for r in range(1, radius + 1):
            pad_lo = [(0, 0)] * 4
            pad_hi = [(0, 0)] * 4
            pad_lo[axis] = (r, 0)
            pad_hi[axis] = (0, r)
            lo = jnp.pad(g, pad_lo)[
                tuple(slice(0, H) if a == axis else slice(None)
                      for a in range(4))
            ]
            sl = [slice(None)] * 4
            sl[axis] = slice(r, H + r)
            hi = jnp.pad(g, pad_hi)[tuple(sl)]
            acc = acc | lo | hi
        g = acc
    return g.reshape(-1)


def _probe_masks(bitfield, H: int, C: int, dt_gamma: float):
    """Choose the probe-mask flavor for the config: single-grid 9^3 masks
    (single cascade, dt_gamma==0) or per-cascade 9^3 masks otherwise."""
    if C == 1 and dt_gamma == 0.0:
        return build_neighbor_masks(bitfield, H)
    return build_neighbor_masks_mc(bitfield, H)


def init_occupancy_state(rspec: RenderSpec) -> OccupancyState:
    H, C = rspec.grid_size, rspec.cascades
    b = rspec.bound
    aabb = jnp.array([-b, -b, -b, b, b, b], jnp.float32)
    if C == 1 and rspec.dt_gamma == 0.0:
        masks = jnp.zeros((H * H * H, NB_WORDS), jnp.uint32)
    else:
        # +1: zero sentinel row (see build_neighbor_masks_mc)
        masks = jnp.zeros((C * H * H * H + 1, MC_WORDS), jnp.uint32)
    return OccupancyState(
        density_grid=jnp.zeros((C, H, H, H), jnp.float32),
        bitfield=jnp.zeros((C * H * H * H,), bool),
        bitfield_dilated=jnp.zeros((C * H * H * H,), bool),
        neighbor_masks=masks,
        mean_density=jnp.float32(0.0),
        iter_density=jnp.int32(0),
        aabb_train=aabb,
        aabb_infer=aabb,
    )


def _cell_centers01(coords, H):
    """Integer cell coords [N,3] -> centers in [-1, 1] (renderer.py:676)."""
    return 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0


def _cascade_bound(cas: int, bound: float) -> float:
    return min(2.0**cas, bound)


def update_density_grid(
    state: OccupancyState,
    density_fn: Callable,
    rspec: RenderSpec,
    rng,
    full: bool,
    decay: float = 0.95,
) -> OccupancyState:
    """One occupancy update (renderer.py:648-765).

    density_fn(x [M,3]) -> sigma [M] (already includes the caller's params;
    density_scale is applied here).
    Full mode re-queries every cell; partial mode queries H^3/4 random cells
    plus an equal number resampled from currently-occupied cells.
    """
    H, C = rspec.grid_size, rspec.cascades
    grid = state.density_grid

    def query_cells(coords, cas: int, key):
        bound = _cascade_bound(cas, rspec.bound)
        half = bound / H
        xyz = _cell_centers01(coords, H) * (bound - half)
        jitter = (jax.random.uniform(key, xyz.shape) * 2.0 - 1.0) * half
        return density_fn(xyz + jitter) * rspec.density_scale

    tmp = -jnp.ones_like(grid)
    if full:
        coords = jnp.stack(
            jnp.meshgrid(
                jnp.arange(H), jnp.arange(H), jnp.arange(H), indexing="ij"
            ),
            axis=-1,
        ).reshape(-1, 3)
        for cas in range(C):
            key = jax.random.fold_in(rng, cas)
            sig = query_cells(coords, cas, key)
            tmp = tmp.at[cas].set(sig.reshape(H, H, H))
    else:
        n = H * H * H // 4
        for cas in range(C):
            k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, cas), 3)
            # uniform random cells
            rand_coords = jax.random.randint(k1, (n, 3), 0, H)
            # occupied-cell resample via inverse CDF over the occupancy mask
            occ_mask = (grid[cas].reshape(-1) > 0).astype(jnp.float32)
            cdf = jnp.cumsum(occ_mask)
            total = cdf[-1]
            u = jax.random.uniform(k2, (n,)) * jnp.maximum(total, 1.0)
            occ_flat = jnp.searchsorted(cdf, u, side="left")
            occ_flat = jnp.clip(occ_flat, 0, H * H * H - 1)
            occ_coords = jnp.stack(
                [occ_flat // (H * H), (occ_flat // H) % H, occ_flat % H], axis=-1
            )
            # when nothing is occupied yet, fall back to the random cells
            occ_coords = jnp.where(total > 0, occ_coords, rand_coords)
            coords = jnp.concatenate([rand_coords, occ_coords], axis=0)
            sig = query_cells(coords, cas, k3)
            flat_idx = (coords[:, 0] * H + coords[:, 1]) * H + coords[:, 2]
            tmp_c = tmp[cas].reshape(-1).at[flat_idx].max(sig)
            tmp = tmp.at[cas].set(tmp_c.reshape(H, H, H))

    # EMA-max where both old and new are valid (renderer.py:752-756)
    valid = (grid >= 0) & (tmp >= 0)
    new_grid = jnp.where(valid, jnp.maximum(grid * decay, tmp), grid)
    mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))

    thresh = jnp.minimum(mean_density, rspec.density_thresh)
    bitfield = (new_grid > thresh).reshape(-1)

    return state.replace(
        density_grid=new_grid,
        bitfield=bitfield,
        bitfield_dilated=dilate_bitfield(bitfield, H),
        neighbor_masks=_probe_masks(bitfield, H, C, rspec.dt_gamma),
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
    )


def mark_untrained_grid(
    state: OccupancyState, poses, intrinsics, rspec: RenderSpec, chunk: int = 64
) -> OccupancyState:
    """Mark cells observed by no training camera as -1 (renderer.py:555-645).

    poses: [B, 4, 4] c2w; intrinsics: (fx, fy, cx, cy).  A cell counts as
    covered when its center is in front of a camera and inside its pinhole
    frustum (with a half-voxel margin).
    """
    H, C = rspec.grid_size, rspec.cascades
    fx, fy, cx, cy = (float(v) for v in intrinsics)
    poses = jnp.asarray(poses, jnp.float32)

    # ONE jitted program: running this body eagerly dispatches ~15
    # primitives, and through a remote-TPU tunnel each primitive pays its own
    # multi-second compile — the eager version stalled startup for minutes
    def body(density_grid, poses):
        coords = jnp.stack(
            jnp.meshgrid(jnp.arange(H), jnp.arange(H), jnp.arange(H),
                         indexing="ij"),
            axis=-1,
        ).reshape(-1, 3)
        world01 = _cell_centers01(coords, H)  # [M, 3]

        counts = []
        for cas in range(C):
            bound = _cascade_bound(cas, rspec.bound)
            half = bound / H
            pts = world01 * (bound - half)  # [M, 3]
            covered = jnp.zeros((pts.shape[0],), jnp.int32)
            B = poses.shape[0]
            for head in range(0, B, chunk):
                p = poses[head : head + chunk]
                cam = pts[None, :, :] - p[:, None, :3, 3]  # [b, M, 3]
                # world->cam with R^T; c2w rotation applied transposed
                cam = jnp.einsum("bmk,bkj->bmj", cam, p[:, :3, :3])
                mz = cam[..., 2] > 0
                mx = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
                my = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
                covered = covered + jnp.sum(mz & mx & my, axis=0)
            counts.append(covered.reshape(H, H, H))
        count = jnp.stack(counts)
        return jnp.where(count == 0, -1.0, density_grid)

    new_grid = jax.jit(body)(state.density_grid, poses)
    return state.replace(density_grid=new_grid)


def set_bitfield(state: OccupancyState, bitfield) -> OccupancyState:
    """Replace the bitfield and keep the derived fields (dilated bitfield,
    neighbor masks) consistent.  The probe-mask flavor is inferred from the
    state's existing neighbor_masks shape (set by init_occupancy_state from
    the RenderSpec)."""
    H = state.density_grid.shape[1]
    C = state.density_grid.shape[0]
    assert bitfield.shape[0] == C * H * H * H, (
        f"bitfield has {bitfield.shape[0]} cells, state expects "
        f"{C}x{H}^3 = {C * H * H * H} (a short bitfield silently disables "
        "the probe march and garbles cascade lookups)")
    # MC masks carry a sentinel row: [C*H^3 + 1, W] vs single [H^3, W]
    if state.neighbor_masks.shape[0] == C * H * H * H + 1:
        masks = build_neighbor_masks_mc(bitfield, H)
    else:
        masks = build_neighbor_masks(bitfield, H)
    return state.replace(
        bitfield=bitfield,
        bitfield_dilated=dilate_bitfield(bitfield, H),
        neighbor_masks=masks,
    )


def reset_state(state: OccupancyState) -> OccupancyState:
    """reset_extra_state (renderer.py:127-137)."""
    return state.replace(
        density_grid=jnp.zeros_like(state.density_grid),
        bitfield=jnp.zeros_like(state.bitfield),
        bitfield_dilated=jnp.zeros_like(state.bitfield_dilated),
        neighbor_masks=jnp.zeros_like(state.neighbor_masks),
        mean_density=jnp.float32(0.0),
        iter_density=jnp.int32(0),
    )


def to_morton_order(grid):
    """Row-major [CAS,H,H,H] -> reference Morton-flat [CAS, H^3] (ckpt io)."""
    from pvd_tpu.ops.morton import morton3d_invert

    C = grid.shape[0]
    H = grid.shape[1]
    codes = jnp.arange(H * H * H, dtype=jnp.uint32)
    xyz = morton3d_invert(codes)  # morton index -> cell coord
    flat = (xyz[:, 0] * H + xyz[:, 1]) * H + xyz[:, 2]
    return grid.reshape(C, -1)[:, flat]


def from_morton_order(grid_m, H: int):
    """Reference Morton-flat [CAS, H^3] -> row-major [CAS,H,H,H]."""
    from pvd_tpu.ops.morton import morton3d

    C = grid_m.shape[0]
    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(H), jnp.arange(H), jnp.arange(H), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    codes = morton3d(coords).astype(jnp.int32)
    return grid_m[:, codes].reshape(C, H, H, H)
