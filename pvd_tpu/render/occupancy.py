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
from jax import lax
from flax import struct

from pvd_tpu.config import RenderSpec


@struct.dataclass
class OccupancyState:
    density_grid: jnp.ndarray  # [CAS, H, H, H] f32; -1 marks untrained cells
    bitfield: jnp.ndarray  # [CAS * H^3] bool, flat row-major
    bitfield_dilated: jnp.ndarray  # [CAS * H^3] bool, 2-cell max-dilation
    # [(H/4)^3, NB_WORDS] uint32 (single-cascade) or
    # [C*(H/4)^3 + 1, MC_WORDS] (multi-cascade/dt_gamma>0, zero sentinel
    # row appended): bit oz*256+oy*16+ox of supercell row (sx*S+sy)*S+sz
    # holds the occupancy of fine cell 4*s + (ox,oy,oz) - SUPER_D — ONE
    # gather resolves a supercell-plus-apron 16^3 neighborhood for the
    # probe-based marcher (renderer.march_rays); [1, NB_WORDS] zeros
    # when the probe paths don't apply (H % 4 != 0)
    neighbor_masks: jnp.ndarray
    mean_density: jnp.ndarray  # scalar f32
    iter_density: jnp.ndarray  # scalar i32
    aabb_train: jnp.ndarray  # [6]
    aabb_infer: jnp.ndarray  # [6]


# Probe-mask geometry (v5e gather engine, micro-benchmarked 2026-08-19,
# tools/micro_maskrows.py): the marginal gather rate is dominated by
# TABLE size, not row width — a [2*128^3, 16B] table gathers ~145-160M
# rows/s and collapses to 27-69M at wider rows, while a [2*32^3, 512B]
# table holds ~547M rows/s.  So the masks are keyed by 4^3 SUPERCELLS
# (rows = C*(H/4)^3, ~66K at H=128) with one side^3-bit row each
# (side = 4 + 2*D): bit (oz*(side//2)*32 + oy*16 + ox) of supercell s
# holds the occupancy of fine cell 4*s + (ox,oy,oz) - D, i.e. the
# supercell plus a D-cell apron.  The layout is word-aligned strips
# (word = oz*(side//2) + oy>>1, bit = (oy&1)*16 + ox), so rows build by
# pure strided slicing.  Reach: a probe at fine cell c (supercell c>>2)
# resolves any point within +-D cells of c.  The apron D is PER-FLAVOR —
# the march's bit-select where-chain costs ~(word count) VPU ops per
# lattice point, so each flavor gets the smallest apron its window
# geometry needs:
#  - single-cascade probe march: stride clamp at half-span <= D cells
#    -> stride 32 at the default 1024-step lattice (W=32 probes/ray);
#  - MC march: dt < 1 selected-mip cell per step (renderer's F bound),
#    +-5 steps with recurrence drift -> D = 6 (16^3, 128 words).
#    (W padded to a multiple of 8: the extraction where-chain falls off
#    a tiling cliff otherwise, 187 ms vs 2 ms measured at W=147 vs 152.)
SUPER_G = 4  # supercell edge, fine cells
# NOTE on apron sizing (round-5 negative result, keep D = 6): a D=4
# (12^3, 72-word) single-cascade apron SHOULD cut the bit-select chain
# 44%, and does in isolation (tools/micro_extract: 1.01 vs 1.27 ms at
# tuned shapes) — but in the full step XLA refuses the r4 fusion shape
# for it (72-lane minor tiles, then padded-row variant: one 4.3 ms
# megafusion at the chain; step 10.0 -> 14.1 ms both ways).  The chain
# is only profitable at exactly one full 128-lane u32 tile per row.
SUPER_D = 6  # single-cascade apron reach, fine cells
SUPER_SIDE = SUPER_G + 2 * SUPER_D  # 16
NB_WORDS = SUPER_SIDE * (SUPER_SIDE // 2)  # 128 u32 (512B, tile-exact)
NB_CHAIN = NB_WORDS
MC_D = 6  # multi-cascade apron reach
MC_SIDE = SUPER_G + 2 * MC_D  # 16
MC_WORDS = MC_SIDE * (MC_SIDE // 2)  # 128 u32 (512B rows, tile-exact)


def _pack_supercells(g, D=SUPER_D):
    """Pack per-supercell occupancy aprons into side^3-bit rows
    (side = SUPER_G + 2*D).

    g: bool [..., H, H, H] with H % SUPER_G == 0; returns uint32
    [..., S, S, S, side^2*(side//2)/...] (S = H // 4) where bit
    oz*(side//2)*32 + oy*16 + ox of supercell s holds
    g[4*s + (ox,oy,oz) - D] (zero outside).  The layout is word-aligned
    (16-bit x-strips, 2 per word, side//2 words per z-plane):
    word = oz*(side//2) + oy>>1, bit = (oy&1)*16 + ox — so the build
    is pure strided slicing with a single 16-bit shift per strip pair,
    and the march extracts bits without cross-word arithmetic.
    (side <= 16 so an x-strip fits a 16-bit half-word.)
    """
    G, side = SUPER_G, SUPER_G + 2 * D
    assert side <= 16 and side % 2 == 0
    wpp = side // 2  # words per z-plane
    H = g.shape[-1]
    S = H // G
    nb = g.ndim - 3
    pad = [(0, 0)] * nb + [(D, side - G - D)] * 3
    gp = jnp.pad(g, pad)

    def strided(a, ax3, off):
        axis = nb + ax3
        start = [0] * a.ndim
        limit = list(a.shape)
        strides = [1] * a.ndim
        start[axis] = off
        limit[axis] = off + G * (S - 1) + 1
        strides[axis] = G
        return lax.slice(a, start, limit, strides)

    # x-strips: occupancy bits along x in one word's low half
    st = None
    for ox in range(side):
        t = strided(gp, 0, ox).astype(jnp.uint32) << jnp.uint32(ox)
        st = t if st is None else st | t
    # y: two 16-bit strips per word -> side//2 words per z-plane
    planes = [
        strided(st, 1, 2 * j) | (strided(st, 1, 2 * j + 1) << jnp.uint32(16))
        for j in range(wpp)
    ]
    # z: side plane slices x side//2 words, in word order oz*wpp + j
    words = [strided(planes[j], 2, oz)
             for oz in range(side) for j in range(wpp)]
    return jnp.stack(words, axis=-1)


@partial(jax.jit, static_argnums=(1,))
def build_neighbor_masks(bitfield, H: int):
    """Supercell probe-mask table for single-cascade scenes:
    [(H/4)^3, NB_WORDS] uint32 (see the SUPER_* constants note).
    Multi-cascade scenes or H % 4 != 0 get a [1, NB_WORDS] zero
    placeholder (the marcher falls back to the non-probe paths).
    Jitted: eagerly the packer's ~160 primitives each pay their own
    dispatch/compile through a remote-TPU tunnel.
    """
    C = bitfield.shape[0] // (H * H * H)
    if C != 1 or H % SUPER_G:
        return jnp.zeros((1, NB_WORDS), jnp.uint32)
    g = bitfield.reshape(H, H, H)
    S = H // SUPER_G
    return _pack_supercells(g).reshape(S * S * S, NB_WORDS)


@partial(jax.jit, static_argnums=(1,))
def build_neighbor_masks_mc(bitfield, H: int):
    """Per-cascade supercell probe-mask table for the multi-cascade /
    dt_gamma>0 marcher (renderer._probe_march_occ_mc):
    [C*(H/4)^3 + 1, MC_WORDS] uint32 — row cas*S^3 + (sx*S+sy)*S+sz
    holds cascade `cas`'s 16^3-bit apron of supercell (sx,sy,sz) (same
    layout as the single-cascade table, batched over cascades).  The
    final row is an all-zero sentinel so the flavor stays
    shape-distinguishable at C == 1.  H % 4 != 0 gets a [1, MC_WORDS]
    placeholder (marcher falls back to the plain lattice path).
    """
    C = bitfield.shape[0] // (H * H * H)
    if H % SUPER_G:
        return jnp.zeros((1, MC_WORDS), jnp.uint32)
    g = bitfield.reshape(C, H, H, H)
    S = H // SUPER_G
    masks = _pack_supercells(g, D=MC_D).reshape(C * S * S * S, MC_WORDS)
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
    S3 = (H // SUPER_G) ** 3 if H % SUPER_G == 0 else 0
    if not S3:
        masks = jnp.zeros((1, NB_WORDS), jnp.uint32)  # probe paths off
    elif C == 1 and rspec.dt_gamma == 0.0:
        masks = jnp.zeros((S3, NB_WORDS), jnp.uint32)
    else:
        # +1: zero sentinel row (see build_neighbor_masks_mc)
        masks = jnp.zeros((C * S3 + 1, MC_WORDS), jnp.uint32)
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
    # MC masks carry a sentinel row: [C*S^3 + 1, W] vs single [S^3, W]
    S3 = (H // SUPER_G) ** 3 if H % SUPER_G == 0 else 0
    if S3 and state.neighbor_masks.shape[0] == C * S3 + 1:
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
