"""Shape-static volumetric rendering.

This module is the TPU-native redesign of `NeRFRenderer.run_cuda`
(distill_mutual/renderer.py:319-556) and the march/composite CUDA kernels
(raymarching.cu:313-494, 504-697, 704-948).

Core reformulation ("occupancy lattice + compaction"): with step size
dt = clamp(t * dt_gamma, dt_min, dt_max), the reference's per-ray DDA visits
a t-trajectory that is INDEPENDENT of occupancy — its empty-space skip
advances t by the SAME dt recurrence until the next voxel boundary
(`do { t += clamp(t*dt_gamma, ...) } while (t < tt)`,
raymarching.cu:399-402), so skipping only decides which trajectory points
EMIT samples.  This holds for every dt_gamma, not just 0 (oracle-tested
against a DDA transcription in tests/test_renderer.py).  So marching
becomes:

  1. generate the per-ray t-lattice [n_rays, max_steps] (closed form for
     dt_gamma == 0, a lax.scan otherwise);
  2. gather occupancy bits at every lattice point (one big vectorized
     lookup);
  3. compact each ray's occupied points into the first `max_samples` slots
     via a per-row cumsum + scatter — the static-shape replacement for the
     CUDA kernel's atomicAdd slot reservation and `mean_count` capping
     (raymarching.py:233-238).

Everything downstream (field query, compositing) then runs on dense
[n_rays, max_samples] tensors with a validity mask, which is exactly what
the MXU wants.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pvd_tpu.config import ModelSpec, RenderSpec
from pvd_tpu.models.api import background_rgb, field_forward
from pvd_tpu.ops.aabb import near_far_from_aabb, polar_from_ray
from pvd_tpu.ops.composite import (
    composite_rays,
    composite_rays_compact,
    composite_stratified,
)
from pvd_tpu.ops.sampling import sample_pdf, stratified_z_vals
from pvd_tpu.render.occupancy import (
    MC_D,
    MC_SIDE,
    SUPER_D,
    SUPER_G,
    SUPER_SIDE,
    OccupancyState,
)

SQRT3 = math.sqrt(3.0)
# budget compaction on probe-path marches: window-hierarchical first-S
# (_first_s_windows) instead of the top_k sort (A/B'd on TPU, see
# _first_s_windows docstring)
_USE_HIER_COMPACT = True


def _super_mask_bit(masks, off, side=SUPER_SIDE):
    """Occupancy bit of fine-cell offset `off` [..., W, F, 3] (values in
    [0, side)) from gathered supercell apron rows `masks` [..., W, nw]:
    word = oz*(side//2) + oy>>1, bit = (oy&1)*16 + ox
    (occupancy._pack_supercells layout).  The word select is an nw-long
    where-chain — vectorized selects that fuse with the gather; its cost
    is ~nw VPU ops per lattice point, which is why each march flavor
    packs the smallest apron its window geometry needs (occupancy.py
    SUPER_D vs MC_D).  Keep W a multiple of 8 (a [4096,147,7] operand
    measured 187 ms vs 2 ms at W=152: tiling cliff).
    """
    word_i = off[..., 2] * (side // 2) + (off[..., 1] >> 1)
    bit_i = (((off[..., 1] & 1) << 4) + off[..., 0]).astype(jnp.uint32)
    word = jnp.zeros(word_i.shape, jnp.uint32)
    # chain only the DATA words: rows are padded out to a full 128-lane
    # u32 tile (occupancy.NB_WORDS note), but word_i never addresses the
    # zero padding (side*(side//2) words carry all side^3 bits)
    for q in range(min(side * (side // 2), masks.shape[-1])):
        word = jnp.where(word_i == q, masks[..., None, q], word)
    return ((word >> bit_i) & jnp.uint32(1)).astype(bool)


class MarchedSamples(NamedTuple):
    """Padded static-shape replacement for the CSR (xyzs/dirs/deltas/rays)
    quadruple the reference threads through distillation
    (renderer.py:374-394 `inherited_params`).

    Lazy flavor (march_rays(lazy_t=True), multi-cascade probe path only):
    t/dt/delta_depth are None and the per-slot LATTICE INDEX is returned
    instead (`lattice_pos` [N, S] i32 + `ts_flat` [N*L] with t of lattice
    point k of ray n at ts_flat[k*N + n]).  Materializing t [N, S] costs a
    [N, L]-lane quad repack + a N*S-row gather (traced 2.7 ms/step on the
    cascade config); budget-compacted rendering only ever consumes t at
    the M << N*S compacted slots, so render_rays gathers those directly.
    """

    t: Optional[jnp.ndarray]  # [N, S] sample distances (0 in padded slots)
    dt: Optional[jnp.ndarray]  # [N, S] integration step of each sample
    delta_depth: Optional[jnp.ndarray]  # [N, S] real marched dist incl skips
    mask: jnp.ndarray  # [N, S] bool validity
    t0: jnp.ndarray  # [N] march start (near, possibly perturbed)
    lattice_pos: Optional[jnp.ndarray] = None  # [N, S] i32 (lazy mode)
    ts_flat: Optional[jnp.ndarray] = None  # [L*N] f32, k-major (lazy mode)


class CompactInfo(NamedTuple):
    """Global valid-sample compaction of a [N, S] sample block into the
    first M slots (the static-shape analog of the reference's mean_count
    point-buffer cap, raymarching.py:233-238).  Trailing valid samples
    beyond the budget are dropped (the reference drops whole rays)."""

    idx: jnp.ndarray  # [M] flat row-major indices into [N*S] (ray-ordered)
    valid: jnp.ndarray  # [M] bool; False slots are padding
    ray_id: jnp.ndarray  # [M] i32 owning ray
    total: jnp.ndarray  # scalar i32: valid samples in the batch (pre-cap)


def compact_samples(mask, budget: int, prefix: bool = False) -> CompactInfo:
    """First `budget` valid positions of mask [N, S], row-major.

    prefix=True asserts each row's valid slots form a PREFIX (always true
    for march output) and switches to a scatter-light formulation: ray
    starts scatter into the budget array (N rows, not N*S) and a cummax
    recovers every slot's owner — 2.2x faster than the generic flat
    cumsum+scatter on the TPU."""
    N, S = mask.shape
    if prefix:
        # Over-budget batches keep WHOLE leading rays and drop trailing
        # ones (the last included ray may be cut short) — matching the
        # reference's keep-complete-rays truncation (raymarching.py:206,
        # 234).  A proportional per-ray-tail policy was A/B'd and is WORSE
        # under heavy truncation: every ray then trains only on its
        # near-camera samples, which on a dense grid are empty space.
        rcnt = jnp.sum(mask.astype(jnp.int32), axis=-1)  # [N]
        total = rcnt.sum()
        rbase = jnp.cumsum(rcnt) - rcnt  # exclusive
        # zero-count rays collide at the next ray's rbase; .max keeps the
        # later (correct) owner, and rbase >= budget drops cleanly
        starts = jnp.zeros((budget,), jnp.int32).at[rbase].max(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        ray = lax.cummax(starts)
        mslot = jnp.arange(budget, dtype=jnp.int32)
        valid = mslot < jnp.minimum(total, budget)
        idx = jnp.where(valid, ray * S + (mslot - rbase[ray]), 0)
        return CompactInfo(idx=idx, valid=valid,
                           ray_id=jnp.where(valid, ray, 0), total=total)
    flat = mask.reshape(-1)
    cnt = jnp.cumsum(flat.astype(jnp.int32))
    total = cnt[-1]
    dest = jnp.where(flat, cnt - 1, budget)  # overflow/invalid -> dropped
    idx = jnp.zeros((budget,), jnp.int32).at[dest].set(
        jnp.arange(N * S, dtype=jnp.int32), mode="drop"
    )
    valid = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(total, budget)
    idx = jnp.where(valid, idx, 0)
    return CompactInfo(idx=idx, valid=valid, ray_id=idx // S, total=total)


def _t_lattice_ln(t0, rspec: RenderSpec, length: Optional[int] = None):
    """Per-ray t-sequence in the scan's NATIVE [L, N] layout (dt_gamma>0).

    Emits ts only: dt = clip(t*dt_gamma, dt_min, dt_max) is the exact
    formula the recurrence applies to the same t, so _dt_from_t recomputes
    it BITWISE instead of the scan materializing a second [L, N] array.
    `length` overrides max_steps (the MC probe march's span-bounded
    lattice, _mc_lattice_len).
    """
    L = length or rspec.max_steps
    dt_min = 2.0 * SQRT3 / rspec.max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (rspec.cascades - 1)) / rspec.grid_size

    # chunked emission: each scan step advances the recurrence B times
    # (a plain unrolled python loop in the body — the exact same clip/add
    # ops in the exact same order, so the lattice is BITWISE identical to
    # a 1-step-per-iteration scan) and emits a [B, N] block, so ys
    # stacking writes L/B big slices instead of L row-sized
    # dynamic_update_slices (the per-step DUS overhead traced 0.34 ms at
    # L=1024; unroll=16 on the 1-step scan recovered only part of it).
    B = 8
    while L % B:  # L is W*F (a multiple of 8) on the MC path; be safe
        B -= 1

    def step(t, _):
        out = []
        for _ in range(B):
            out.append(t)
            t = t + jnp.clip(t * rspec.dt_gamma, dt_min, dt_max)
        return t, jnp.stack(out)

    _, ts = lax.scan(step, t0, None, length=L // B, unroll=4)
    return ts.reshape(L, t0.shape[0])


def _t_lattice(t0, rspec: RenderSpec):
    """Per-ray t-sequence [N, L] and step sizes [N, L]."""
    L = rspec.max_steps
    dt_min = 2.0 * SQRT3 / rspec.max_steps
    if rspec.dt_gamma == 0.0:
        k = jnp.arange(L, dtype=jnp.float32)
        ts = t0[:, None] + k[None, :] * dt_min
        dts = jnp.full_like(ts, dt_min)
    else:
        ts = _t_lattice_ln(t0, rspec).T
        dts = _dt_from_t(ts, jnp.bool_(True), rspec)
    return ts, dts


def _dt_from_t(t, valid, rspec: RenderSpec):
    """Step size as the exact closed form of t on the march lattice.

    Every march path emits dt = clip(t*dt_gamma, dt_min, dt_max) (dt_min
    when dt_gamma==0 — the probe paths require it via use_coarse_march).
    Recomputing instead of gathering keeps compaction to ONE flat 1-D
    gather of t: a [N*S, 2] (t, dt) stack+gather paid a 64x tile-padding
    copy (minor dim 2 vs the (8,128) TPU tile; traced 0.41 ms/step).
    """
    dt_min = 2.0 * SQRT3 / rspec.max_steps
    if rspec.dt_gamma == 0.0:
        # full_like keeps t's shape even under a scalar `valid`
        return jnp.where(valid, jnp.full_like(t, dt_min), 0.0)
    dt_max = 2.0 * SQRT3 * (2 ** (rspec.cascades - 1)) / rspec.grid_size
    return jnp.where(
        valid, jnp.clip(t * rspec.dt_gamma, dt_min, dt_max), 0.0)


def _occupancy_lookup(bitfield, pos, dts, rspec: RenderSpec):
    """Occupancy bit at each lattice position.

    pos: [..., 3] clamped to [-bound, bound]; dts: [...] step sizes.
    Cascade selection follows raymarching.cu:44-56: mip level is the max of
    the position exponent and the step-size exponent.
    """
    H, C = rspec.grid_size, rspec.cascades
    if C == 1:
        mip_bound = min(1.0, rspec.bound)
        level = None
    else:
        mx = jnp.max(jnp.abs(pos), axis=-1)
        lvl_pos = jnp.clip(jnp.frexp(mx)[1], 0, C - 1)
        lvl_dt = jnp.clip(jnp.frexp(dts * H * 0.5)[1], 0, C - 1)
        level = jnp.maximum(lvl_pos, lvl_dt)
        mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32), rspec.bound)[
            ..., None
        ]
    n = (0.5 * (pos / mip_bound + 1.0) * H).astype(jnp.int32)
    n = jnp.clip(n, 0, H - 1)
    flat = (n[..., 0] * H + n[..., 1]) * H + n[..., 2]
    if level is not None:
        flat = flat + level * (H * H * H)
    # flat 1-D index: 2-D indices halve the TPU gather row rate
    return bitfield[flat.reshape(-1)].reshape(flat.shape)


def _compact_first_k(mask, k: int):
    """Positions of the first k True entries per row via lax.top_k.

    Score True entries by descending (L - position) so top_k returns the
    FIRST k True positions in ascending order — 5x faster on TPU than the
    prefix-sum + vmap'd searchsorted formulation it replaces.

    mask: [N, L] bool. Returns (pos [N, k] clamped indices, valid [N, k]).
    """
    L = mask.shape[1]
    score = jnp.where(mask, jnp.int32(L) - jnp.arange(L, dtype=jnp.int32), 0)
    vals, pos = lax.top_k(score, min(k, L))
    if k > L:  # more slots than lattice points: pad with invalid entries
        pad = ((0, 0), (0, k - L))
        pos = jnp.pad(pos, pad, constant_values=L - 1)
        vals = jnp.pad(vals, pad, constant_values=0)
    return jnp.minimum(pos, L - 1), vals > 0


def _first_s_windows(occ_wf, S: int):
    """First-S occupied positions of occ [N, W, F] (row-major flattened),
    exploiting the probe marches' window structure instead of sorting:
    per-window counts + exclusive base (cumsum over W), each output
    slot's window by a compare+reduce, its bits by a W-long where-chain
    of [N, F] slabs, and the within-window offset by cumsum + argmax.

    Matches _compact_first_k(occ.reshape(N, W*F), S) on valid slots
    (exactness asserted in tools/micro_compact.py and the march oracle
    tests); candidate replacement for the budget top_k (which fully
    sorts [N, L]: 0.64 ms/step traced on the cascade config).
    """
    N, W, F = occ_wf.shape
    cnt_w = jnp.sum(occ_wf.astype(jnp.int32), axis=-1)  # [N, W]
    csum = jnp.cumsum(cnt_w, axis=-1)
    base = csum - cnt_w  # exclusive
    s = jnp.arange(S, dtype=jnp.int32)
    # window containing slot s: the LAST w with base[w] <= s (ties from
    # zero-count windows resolve forward to the occupied one)
    wi = jnp.sum((base[:, :, None] <= s[None, None, :]).astype(jnp.int32),
                 axis=1) - 1  # [N, S]
    wi = jnp.clip(wi, 0, W - 1)
    base_s = jnp.zeros((N, S), jnp.int32)
    bits_s = jnp.zeros((N, S, F), bool)
    for q in range(W):
        at = wi == q
        base_s = jnp.where(at, base[:, q, None], base_s)
        bits_s = jnp.where(at[..., None], occ_wf[:, None, q, :], bits_s)
    r = s[None, :] - base_s  # within-window rank
    c = jnp.cumsum(bits_s.astype(jnp.int32), axis=-1)
    hit = bits_s & (c == (r[..., None] + 1))
    f = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    valid = s[None, :] < csum[:, -1:]
    return jnp.clip(wi * F + f, 0, W * F - 1), valid


def _first_k_small(mask, k: int):
    """First-k True positions per row for SMALL k: one cumsum + k
    argmax/any reduces over [N, W].  lax.top_k on the same operand fully
    sorts (traced 0.56 ms/step at [4096, 96] -> 4 on the cascade config);
    this returns the same ascending positions for ~20x less.

    mask: [N, W] bool. Returns (pos [N, k] i32, valid [N, k] bool);
    invalid slots hold pos 0.
    """
    c = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    pos, valid = [], []
    for j in range(1, k + 1):
        hit = mask & (c == j)
        pos.append(jnp.argmax(hit, axis=1).astype(jnp.int32))
        valid.append(jnp.any(hit, axis=1))
    return jnp.stack(pos, axis=1), jnp.stack(valid, axis=1)


def _cell_coords(pos, rspec: RenderSpec):
    """Clamped integer cell coords [..., 3] (single-cascade formula)."""
    H = rspec.grid_size
    mip_bound = min(1.0, rspec.bound)
    n = (0.5 * (pos / mip_bound + 1.0) * H).astype(jnp.int32)
    return jnp.clip(n, 0, H - 1)


def _probe_march_occ(neighbor_masks, rays_o, rays_d, t0, fars,
                     rspec: RenderSpec):
    """Exact per-lattice-point occupancy [N, L] via supercell probes:
    ONE mask-row gather per `probe_stride` lattice points.

    Replaces both stages of the old dilated two-pass march: every fine
    point of a stride-F window lies within +-SUPER_D cells of the
    window-center probe (F is clamped to guarantee this,
    RenderSpec.effective_probe_stride), so the probe supercell's
    16^3-bit apron row resolves all F points exactly — the same bits a
    direct bitfield lookup would read, at 1/F the gather rows, from a
    (H/4)^3-row table small enough for the gather engine's fast regime
    (~547M rows/s vs ~145M at H^3 rows, see occupancy.SUPER_G note).
    """
    N = rays_o.shape[0]
    L = rspec.max_steps
    H = rspec.grid_size
    F = rspec.effective_probe_stride
    W = L // F
    dt_min = 2.0 * SQRT3 / rspec.max_steps

    # probe at each window's center lattice point
    k_mid = (jnp.arange(W, dtype=jnp.float32) * F) + (F // 2)
    ts_mid = t0[:, None] + k_mid[None, :] * dt_min  # [N, W]
    pos_mid = rays_o[:, None, :] + ts_mid[..., None] * rays_d[:, None, :]
    pos_mid = jnp.clip(pos_mid, -rspec.bound, rspec.bound)
    cell_mid = _cell_coords(pos_mid, rspec)  # [N, W, 3]
    sc = cell_mid >> 2  # supercell
    S = H // SUPER_G
    row = (sc[..., 0] * S + sc[..., 1]) * S + sc[..., 2]
    # NOTE: folding dead (t >= far) windows to a duplicate row was tried
    # and does NOT speed the gather engine up (micro-benchmarked: half-
    # duplicate index streams gather no faster than random) — row count
    # is what matters, so dead windows cost the same either way.
    masks = jnp.take(neighbor_masks, row.reshape(-1), axis=0)  # [N*W, nw]
    masks = masks.reshape(N, W, neighbor_masks.shape[-1])

    # fine points: cell offset in the probe's supercell apron frame
    k_all = jnp.arange(L, dtype=jnp.float32).reshape(W, F)
    ts = t0[:, None, None] + k_all[None] * dt_min  # [N, W, F]
    pos = rays_o[:, None, None, :] + ts[..., None] * rays_d[:, None, None, :]
    pos = jnp.clip(pos, -rspec.bound, rspec.bound)
    cell = _cell_coords(pos, rspec)  # [N, W, F, 3]
    off = jnp.clip(cell - (sc[:, :, None, :] << 2) + SUPER_D,
                   0, SUPER_SIDE - 1)
    occ = _super_mask_bit(masks, off)
    occ = occ & (ts < fars[:, None, None])
    return occ.reshape(N, L), ts.reshape(N, L)


def _mc_window(rspec: RenderSpec) -> int:
    """MC probe window width F: the largest odd F whose +-(F//2)-step
    reach stays inside the +-MC_D-cell apron (see _probe_march_occ_mc's
    window-width note) — 13 at dt_gamma=0, 11 at 1/256."""
    g = max(rspec.dt_gamma, 0.0)
    half = MC_D
    while half > 0 and half * (1.0 + g) ** half > MC_D:
        half -= 1
    return 2 * half + 1


def _mc_lattice_len(rspec: RenderSpec):
    """Static (L_m, W) for the MC probe march: the smallest W*F lattice
    (W a multiple of 8 for tiling) covering the worst-case in-box span.

    dt grows along the ray (dt = clip(t*dt_gamma, dt_min, dt_max)), so a
    ray needs the most lattice points when it starts at the smallest
    possible t: march callers clamp near to rspec.min_near
    (near_far_from_aabb), rays_d is unit-norm (ops/rays.py), and
    far - near <= the AABB diagonal 2*bound*sqrt(3) (a chord of the
    box), so the float32 recurrence from min_near bounds every ray's
    live lattice length — points past it have t >= far for EVERY ray
    and carry no samples.  At dt_gamma=1/256, bound=2, max_steps=1024
    this cuts the lattice from 1024 to ~800 points (~20% off all
    per-lattice-point march work).  dt_gamma == 0 keeps max_steps (the
    fixed-dt lattice needs every step).
    """
    F = _mc_window(rspec)
    L = rspec.max_steps
    g = max(rspec.dt_gamma, 0.0)
    if g > 0.0:
        dt_min = np.float32(2.0 * SQRT3 / rspec.max_steps)
        dt_max = np.float32(2.0 * SQRT3 * (2 ** (rspec.cascades - 1))
                            / rspec.grid_size)
        t = np.float32(rspec.min_near)
        t_end = np.float32(t + np.float32(2.0 * rspec.bound * SQRT3))
        n = 0
        while t < t_end and n < rspec.max_steps:
            t = np.float32(
                t + np.clip(np.float32(t * np.float32(g)), dt_min, dt_max))
            n += 1
        L = min(n + 4, rspec.max_steps)  # +4: fp margin vs the device scan
    W = -(-L // (8 * F)) * 8  # ceil(L / F) rounded up to a multiple of 8
    return W * F, W


def _probe_march_occ_mc(neighbor_masks, rays_o, rays_d, t0, fars,
                        rspec: RenderSpec):
    """Occupancy [N, L_m] for multi-cascade and/or dt_gamma>0 lattices via
    per-cascade supercell apron probes (occupancy.build_neighbor_masks_mc),
    one mask-row gather per F lattice points.  Builds its own span-bounded
    t-lattice (_mc_lattice_len) and returns (occ [N, L_m] bool,
    ts_ln [L_m, N] f32 in the scan-native k-major layout).

    Each window of 7 points probes at its middle point; a fine point is
    resolved from the probe supercell's 16^3-bit apron row when (a) its
    mip equals the probe's mip and (b) its cell lies within the apron
    (probe supercell +- MC_D cells) in that mip's frame.  The mip
    rule (raymarching.cu:44-56) bounds a step by the selected mip's cell
    size (x sqrt(3) at the top mip), so a +-3-step point moves
    <= 3*sqrt(3) cells -> floor-cell delta <= 6 = MC_D: every
    same-mip point resolves exactly, including the top-mip dt_max
    overrun.  Cross-mip points (a mip transition inside the window) get
    an EXACT per-point lookup through a first-U-per-ray compaction (see
    the inline note) — the march is exact up to that U budget, and errs
    occupied (never drops) past it.

    Perf note (v5e, micro-benchmarked 2026-08-19, tools/micro_maskrows):
    gather rate is dominated by TABLE size — the per-CELL [C*H^3, 16B]
    table this replaces gathered ~145M rows/s at 1 row per 3 lattice
    points (8.5 ms/step traced on the cascade config), while the
    supercell [C*(H/4)^3, 512B] table holds ~547M rows/s at 1 row per
    7 points: ~3x fewer rows, ~3.8x faster each.

    Window width: the mip-select rule (raymarching.cu:44-56) puts dt in
    [cell/2, cell) of the SELECTED mip (frexp semantics), and a window's
    dts all share the probe's lvl_dt up to the (1+dt_gamma)^(F//2)
    recurrence drift — so each step moves < 1 probe-mip cell per axis
    and the largest odd F with (F//2)*(1+g)^(F//2) <= MC_D keeps
    every same-mip point inside the probe's apron (floor-cell delta
    <= ceil(distance) <= MC_D).  The one exception is a dt_max-CLAMPED
    window (top mip at t >= dt_max/dt_gamma, where dt reaches
    sqrt(3)*cell — r4's universal per-step bound): its points may leave
    the apron, land in `unres`, and resolve through the exact per-point
    override below (conservative past the Uw budget, never wrong).

    Layout note (round-5 negative result, kept for the record): an SoA
    [W, F, N] rewrite (N minor, tile-exact, no F->128 lane padding) made
    the word-select where-chain 25x SLOWER (18.9 ms of loop fusions) —
    the chain is only fast when the nw-word rows and the chain's select
    lanes stay LANE-ALIGNED ([..., F_pad, nw] minor layouts), which XLA
    lowers to in-register lane shuffles.  AoS [N, W, F] stays.
    """
    N = rays_o.shape[0]
    H = rspec.grid_size
    C = rspec.cascades
    S = H // SUPER_G
    g = max(rspec.dt_gamma, 0.0)
    F = _mc_window(rspec)
    L_m, W = _mc_lattice_len(rspec)
    dt_min = 2.0 * SQRT3 / rspec.max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (C - 1)) / H

    # the lattice is generated at exactly W*F points (no sentinel pad —
    # _mc_lattice_len guarantees t(L_m) >= far for every ray)
    if g == 0.0:
        k_ln = jnp.arange(L_m, dtype=jnp.float32)
        ts_ln = t0[None, :] + k_ln[:, None] * dt_min
        ts = t0[:, None] + k_ln[None, :] * dt_min  # no transpose
    else:
        ts_ln = _t_lattice_ln(t0, rspec, length=L_m)
        ts = ts_ln.T  # [N, L_m]
    dts = _dt_from_t(ts, jnp.bool_(True), rspec)

    def levels(pos, dt):
        if C == 1:
            return jnp.zeros(pos.shape[:-1], jnp.int32)
        mx = jnp.max(jnp.abs(pos), axis=-1)
        lvl_pos = jnp.clip(jnp.frexp(mx)[1], 0, C - 1)
        lvl_dt = jnp.clip(jnp.frexp(dt * H * 0.5)[1], 0, C - 1)
        return jnp.maximum(lvl_pos, lvl_dt)

    def mip_bound(level):
        return jnp.minimum(2.0 ** level.astype(jnp.float32),
                           rspec.bound)

    # probe at the middle point of each F-point window
    ts_p = ts[:, F // 2::F]  # [N, W]
    dts_p = dts[:, F // 2::F]
    pos_p = rays_o[:, None, :] + ts_p[..., None] * rays_d[:, None, :]
    pos_p = jnp.clip(pos_p, -rspec.bound, rspec.bound)
    lvl_p = levels(pos_p, dts_p)  # [N, W]
    mb_p = mip_bound(lvl_p)[..., None]
    cell_p = jnp.clip((0.5 * (pos_p / mb_p + 1.0) * H).astype(jnp.int32),
                      0, H - 1)  # [N, W, 3]
    sc_p = cell_p >> 2  # supercell of the probe cell
    row = (sc_p[..., 0] * S + sc_p[..., 1]) * S + sc_p[..., 2] \
        + lvl_p * (S * S * S)
    # NOTE: the [N*W, nw] -> [N, W, nw] reshape of the gather output
    # materializes a 0.45 ms copy even at tile-exact shapes, but keeping
    # masks flat and running the chain on merged-major [N*W, F] operands
    # was traced 4x WORSE overall (42 ms/step): XLA's fast lane-shuffle
    # lowering of the where-chain pattern-matches the 3-D AoS form only.
    masks = jnp.take(neighbor_masks, row.reshape(-1), axis=0,
                     mode="clip").reshape(N, W, neighbor_masks.shape[-1])

    # fine points
    ts_f = ts.reshape(N, W, F)
    dts_f = dts.reshape(N, W, F)
    pos = rays_o[:, None, None, :] + ts_f[..., None] * rays_d[:, None,
                                                             None, :]
    pos = jnp.clip(pos, -rspec.bound, rspec.bound)
    lvl_k = levels(pos, dts_f)  # [N, W, F]
    # fine cell in the PROBE's mip frame with the EXACT lookup's clipped
    # formula (_occupancy_lookup) — for same-mip points mb_p equals the
    # point's own mip bound, so a resolved bit matches the direct lookup
    # bit-for-bit (an unclipped floor here once dropped a boundary-cell
    # sample: index H floors outside the grid while the exact path clips
    # to H-1).  Clipping is contractive, so the +-R-cell reach bound of
    # the +-(F//2)-step window still holds on clipped cells.
    n_k = jnp.clip((0.5 * (pos / mb_p[:, :, None, :] + 1.0) * H)
                   .astype(jnp.int32), 0, H - 1)
    off = n_k - (sc_p[:, :, None, :] << 2) + MC_D  # apron-frame offset
    inside = jnp.all((off >= 0) & (off < MC_SIDE), axis=-1)  # [N, W, F]
    resolved = inside & (lvl_k == lvl_p[..., None])
    occ_bit = _super_mask_bit(masks, jnp.clip(off, 0, MC_SIDE - 1),
                              side=MC_SIDE)

    # Cross-mip (unresolved) points: EXACT per-point lookup.  lvl(t)
    # changes only O(cascades) times per ray (lvl_dt is nondecreasing;
    # |pos| along a ray has <= 3 local minima), so windows holding an
    # unresolved point are rare (~0.4/ray measured on a converged C=2
    # grid).  Compact the first Uw such WINDOWS per ray, gather every
    # point of each selected window its OWN mask row (the row's center
    # bit IS the direct-lookup bit), and fold the bits back.  Windows
    # past the Uw budget err OCCUPIED (conservative: never drops a
    # sample; an empty grid has far fewer than Uw transitions per ray,
    # so empty -> pure background stays exact).  This replaced an
    # any-geometry-of-the-probe fallback that read the WRONG CASCADE's
    # neighborhood and could DROP a sample at a dyadic |pos| boundary.
    Uw = 4
    live = ts_f < fars[:, None, None]
    if L_m > rspec.max_steps:
        # reference parity: never march past max_steps lattice positions
        # (raymarching.cu caps steps); only reachable when ceil-rounding
        # W*F past max_steps (dt_gamma == 0 multi-cascade).  Masked into
        # `live` so dead beyond-cap points can't eat the override budget.
        k_i = jnp.arange(L_m, dtype=jnp.int32).reshape(1, W, F)
        live = live & (k_i < rspec.max_steps)
    unres = (~resolved) & live
    unres_w = jnp.any(unres, axis=-1)  # [N, W]
    pos_w, valid_w = _first_k_small(unres_w, Uw)  # [N, Uw] window idx
    # the override's t values REPLAY the lattice recurrence from the
    # gathered window-start t — bitwise identical to the scan (the same
    # clip/add ops in the same order), at one N*Uw 4B-row gather instead
    # of the r4 N*Uw F-float WINDOW-row gather whose [N*W, F] source
    # view cost a 17 MB relayout copy (traced 0.67 ms/step on the
    # cascade config).  dt_gamma == 0 uses the lattice's own closed form
    # (t0 + k*dt_min with k exact in f32) — also bitwise.
    if g == 0.0:
        k_u = ((pos_w * F)[:, :, None]
               + jnp.arange(F, dtype=jnp.int32)[None, None, :]
               ).astype(jnp.float32)
        t_u = (t0[:, None, None] + k_u * dt_min).reshape(N, Uw * F)
    else:
        start = (pos_w * (F * N)
                 + jnp.arange(N, dtype=jnp.int32)[:, None])  # k*N + n
        t_cur = jnp.take(ts_ln.reshape(-1), start.reshape(-1),
                         mode="clip").reshape(N, Uw)
        parts = [t_cur]
        for _ in range(F - 1):
            t_cur = t_cur + jnp.clip(t_cur * rspec.dt_gamma, dt_min, dt_max)
            parts.append(t_cur)
        t_u = jnp.stack(parts, axis=-1).reshape(N, Uw * F)
    dt_u = _dt_from_t(t_u, jnp.bool_(True), rspec)
    p_u = jnp.clip(rays_o[:, None, :] + t_u[..., None] * rays_d[:, None, :],
                   -rspec.bound, rspec.bound)
    lvl_u = levels(p_u, dt_u)
    mb_u = mip_bound(lvl_u)[..., None]
    n_u = jnp.clip((0.5 * (p_u / mb_u + 1.0) * H).astype(jnp.int32),
                   0, H - 1)
    sc_u = n_u >> 2
    row_u = (sc_u[..., 0] * S + sc_u[..., 1]) * S + sc_u[..., 2] \
        + lvl_u * (S * S * S)
    # pad the gather to a multiple-of-8 column count: reshaping a
    # [N*44, nw] gather output to [N, 44, nw] pads 44 sublanes to 48 —
    # a 92 MB relayout copy (traced 0.59 ms); gathering 4 extra sentinel
    # rows per ray instead makes the reshape a free major-dim split
    UFp = -(-(Uw * F) // 8) * 8
    row_u_p = jnp.pad(row_u, ((0, 0), (0, UFp - Uw * F)),
                      constant_values=neighbor_masks.shape[0] - 1)
    m_u = jnp.take(neighbor_masks, row_u_p.reshape(-1), axis=0,
                   mode="clip").reshape(N, UFp, -1)
    # the point's OWN cell bit in its own supercell row: offset
    # (n_u & 3) + D per axis (varies per point, unlike the old
    # fixed-center per-cell layout); the chain runs on the padded
    # column count and only the final (cheap bool) bits are sliced
    off_u = jnp.pad((n_u & 3) + MC_D, ((0, 0), (0, UFp - Uw * F), (0, 0)))
    b_u = (_super_mask_bit(m_u, off_u[:, :, None, :],
                           side=MC_SIDE)[..., 0][:, :Uw * F]
           & valid_w.repeat(F, axis=1)).reshape(N, Uw, F)
    at_w = (jnp.arange(W, dtype=jnp.int32)[None, :, None]
            == pos_w[:, None, :]) & valid_w[:, None, :]  # [N, W, Uw]
    override_w = jnp.any(at_w, axis=-1)  # [N, W]
    override_bit = jnp.any(
        at_w[:, :, :, None] & b_u[:, None, :, :], axis=2)  # [N, W, F]

    occ = jnp.where(resolved, occ_bit,
                    jnp.where(override_w[..., None], override_bit, True))
    occ = occ & live
    return occ.reshape(N, L_m), ts_ln


def march_rays(
    bitfield,
    rays_o,
    rays_d,
    nears,
    fars,
    rspec: RenderSpec,
    perturb_key=None,
    bitfield_dilated=None,
    neighbor_masks=None,
    lazy_t: bool = False,
) -> MarchedSamples:
    """March all rays through the occupancy grid into padded sample slots.

    Single-cascade dt_gamma==0 scenes take the probe path (one supercell
    apron gather per `probe_stride` lattice points — exact, see
    _probe_march_occ).  Otherwise, when `bitfield_dilated` is given a
    two-stage exact test runs: the dilated field is probed every
    `coarse_stride` lattice points; only hit windows are fine-tested.

    lazy_t=True (multi-cascade probe path only): skip materializing
    t/dt/delta_depth [N, S] and return lattice_pos + ts_flat instead
    (see MarchedSamples docstring) — budget-compacted callers gather t
    at their M compacted slots directly.
    """
    N = rays_o.shape[0]
    S = rspec.max_samples
    L = rspec.max_steps
    dt_min = 2.0 * SQRT3 / rspec.max_steps

    t0 = nears
    if perturb_key is not None:
        t0 = t0 + dt_min * jax.random.uniform(perturb_key, (N,))

    n_super = (rspec.cascades * (rspec.grid_size // SUPER_G) ** 3
               if rspec.grid_size % SUPER_G == 0 else -1)
    n_super1 = ((rspec.grid_size // SUPER_G) ** 3
                if rspec.grid_size % SUPER_G == 0 else -1)
    use_probe = neighbor_masks is not None and rspec.use_coarse_march \
        and neighbor_masks.shape[0] == n_super1
    # multi-cascade / dt_gamma>0 probe path (per-cascade supercell masks
    # with a sentinel row: [C*(H/4)^3 + 1, 128],
    # occupancy.build_neighbor_masks_mc)
    use_probe_mc = (not use_probe) and neighbor_masks is not None \
        and rspec.coarse_march and neighbor_masks.shape[0] == n_super + 1
    use_coarse = (not use_probe) and (not use_probe_mc) \
        and bitfield_dilated is not None and rspec.use_coarse_march
    if use_probe:
        occ, ts = _probe_march_occ(neighbor_masks, rays_o, rays_d, t0, fars,
                                   rspec)
        dts = jnp.full_like(ts, dt_min)
        lattice_valid = None
    elif use_probe_mc:
        # the MC march builds its own span-bounded lattice and returns
        # the scan-native ts_ln [L_m, N] so lazy_t can gather t at the
        # compacted slots from a FREE flatten (k*N + n) instead of the
        # [N, L]-lane quad repack the eager t_out pays below
        occ, ts_ln = _probe_march_occ_mc(neighbor_masks, rays_o, rays_d,
                                         t0, fars, rspec)
        lattice_valid = None
    elif use_coarse:
        F = rspec.coarse_stride
        # probe the dilated field at every F-th lattice point
        kc = jnp.arange(0, L, F, dtype=jnp.float32)  # [L/F]
        ts_c = t0[:, None] + kc[None, :] * dt_min
        pos_c3 = rays_o[:, None, :] + ts_c[..., None] * rays_d[:, None, :]
        pos_c3 = jnp.clip(pos_c3, -rspec.bound, rspec.bound)
        hit = _occupancy_lookup(bitfield_dilated, pos_c3, ts_c * 0 + dt_min,
                                rspec)
        hit = hit & (ts_c < fars[:, None])
        # keep the first S candidate windows, expand each to its F fine pts
        win_pos, win_valid = _compact_first_k(hit, S)  # [N, S]
        fine_idx = (win_pos[..., None] * F
                    + jnp.arange(F, dtype=jnp.int32)[None, None, :])
        fine_idx = fine_idx.reshape(N, S * F)  # lattice indices, ascending
        ts = t0[:, None] + fine_idx.astype(jnp.float32) * dt_min
        dts = jnp.full_like(ts, dt_min)
        lattice_valid = jnp.repeat(win_valid, F, axis=1)
    else:
        ts, dts = _t_lattice(t0, rspec)  # [N, L]
        lattice_valid = None

    if not (use_probe or use_probe_mc):
        pos = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
        pos = jnp.clip(pos, -rspec.bound, rspec.bound)
        occ = _occupancy_lookup(bitfield, pos, dts, rspec)
        occ = occ & (ts < fars[:, None])
        if lattice_valid is not None:
            occ = occ & lattice_valid

    # compact occupied lattice points into the first S slots per ray
    if S >= occ.shape[1]:
        # full-trajectory mode (eval: S == max_steps) — every lattice point
        # keeps its slot, no top_k
        L_occ = occ.shape[1]
        pos_c = jnp.broadcast_to(jnp.arange(L_occ, dtype=jnp.int32),
                                 (N, L_occ))
        mask = occ
        if S > L_occ:
            pos_c = jnp.pad(pos_c, ((0, 0), (0, S - L_occ)),
                            constant_values=L_occ - 1)
            mask = jnp.pad(mask, ((0, 0), (0, S - L_occ)))
    else:
        if _USE_HIER_COMPACT and (use_probe or use_probe_mc):
            # probe-path occ is a reshaped [N, W, F] window block; the
            # hierarchical first-S avoids top_k's full [N, L] sort
            Fh = (rspec.effective_probe_stride if use_probe
                  else _mc_window(rspec))
            pos_c, mask = _first_s_windows(
                occ.reshape(N, occ.shape[1] // Fh, Fh), S)
        else:
            pos_c, mask = _compact_first_k(occ, S)
    if use_probe_mc and lazy_t:
        # budget-compacted callers never touch t/dt/delta_depth at [N, S]:
        # render_rays gathers t at its M compacted slots from ts_flat
        # (t of lattice point k of ray n at ts_flat[k*N + n]) and dt is
        # the exact closed form of t (_dt_from_t)
        return MarchedSamples(t=None, dt=None, delta_depth=None, mask=mask,
                              t0=t0, lattice_pos=pos_c,
                              ts_flat=ts_ln.reshape(-1))
    if use_probe:
        # probe-mode ts is affine in the lattice index: reconstruct instead
        # of gathering (2x [N, S]<-[N, L] take_along_axis was the march's
        # dominant cost — the TPU gather engine hates 2-D indices)
        t_out = (t0[:, None] + pos_c.astype(jnp.float32) * dt_min) * mask
        dt_out = jnp.where(mask, dt_min, 0.0)
    elif use_probe_mc:
        # ONE flat 1-D gather for t (2-D take_along_axis runs at ~89M
        # rows/s vs ~210M flat; traced 6.7 ms/step on the cascade config),
        # packed 4-wide: 4B f32 rows gather at ~140M rows/s while 16B
        # rows hold the full rate, so fetch t[k//4*4 : ...+4] and select
        # lane k%4.  dt is an exact function of t on the _t_lattice
        # (dt = clip(t*dt_gamma, dt_min, dt_max), see _t_lattice's scan)
        # so it is recomputed instead of gathered.
        ts = ts_ln.T  # eager (non-lazy) callers only pay this transpose
        L_ts = ts.shape[1]
        L4 = -(-L_ts // 4) * 4
        ts4 = jnp.pad(ts, ((0, 0), (0, L4 - L_ts))) if L4 != L_ts else ts
        flat4 = jnp.arange(N, dtype=jnp.int32)[:, None] * L4 + pos_c
        quad = ts4.reshape(-1, 4)[(flat4 >> 2).reshape(-1)].reshape(N, S, 4)
        lane = flat4 & 3
        t_out = jnp.zeros((N, S), ts.dtype)
        for q in range(4):
            t_out = jnp.where(lane == q, quad[..., q], t_out)
        t_out = t_out * mask
        dt_out = _dt_from_t(t_out, mask, rspec)
    else:
        t_out = jnp.take_along_axis(ts, pos_c, axis=1) * mask
        dt_out = jnp.take_along_axis(dts, pos_c, axis=1) * mask

    # delta_depth_i = u_i - u_{previous VALID sample}, u = t + dt, seeded
    # with t0 (the "real delta" depth channel, raymarching.cu:460-465).
    # prev-valid via a running cummax of masked u (u is nondecreasing), so
    # the masked cumsum telescopes to u_i - t0 in full-trajectory mode
    # (scattered masks) exactly as it does for compacted prefix masks.
    u = t_out + dt_out
    run = lax.cummax(jnp.where(mask, u, -jnp.inf), axis=1)
    prev = jnp.maximum(
        jnp.concatenate([t0[:, None], run[:, :-1]], axis=1), t0[:, None])
    delta_depth = jnp.where(mask, u - prev, 0.0)

    return MarchedSamples(t=t_out, dt=dt_out, delta_depth=delta_depth,
                          mask=mask, t0=t0)


def sample_positions(samples: MarchedSamples, rays_o, rays_d, bound: float):
    """[N, S, 3] clamped world positions of the marched samples."""
    pos = rays_o[:, None, :] + samples.t[..., None] * rays_d[:, None, :]
    return jnp.clip(pos, -bound, bound)


def render_rays(
    params,
    spec: ModelSpec,
    rspec: RenderSpec,
    occ: OccupancyState,
    rays_o,
    rays_d,
    *,
    training: bool,
    bg_color=1.0,
    perturb_key=None,
    want_color: bool = True,
    composite: bool = True,
    early_stop: bool = False,
    inherited: Optional[MarchedSamples] = None,
    inherited_compact: Optional[CompactInfo] = None,
    inherited_t_c: Optional[jnp.ndarray] = None,
):
    """Full occupancy-grid render (reference run_cuda, renderer.py:319-556).

    Returns a dict with point tensors (sigmas, sigma_logit, fea_sc, rgb_l,
    mask, samples) and — when composite=True — image [N,3], depth [N],
    weights_sum [N].  `inherited` replays another model's exact samples
    (the distillation alignment invariant, renderer.py:374-394).
    `want_color=False` is distillation stage 1; `composite=False` with color
    is stage 2.

    When rspec.samples_per_ray > 0 the field network runs on the globally
    COMPACTED valid samples (first M of the batch, CompactInfo) instead of
    the padded [N, S] block; point tensors in the result are then [M]-shaped
    with result['mask'] = the [M] validity mask and result['compact'] set.
    Compositing is unchanged (compacted outputs scatter back to [N, S]).
    """
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    aabb = occ.aabb_train if training else occ.aabb_infer
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, rspec.min_near)

    N = rays_o.shape[0]
    budget = rspec.sample_budget(N)
    if inherited is None:
        samples = march_rays(
            occ.bitfield, rays_o, rays_d, nears, fars, rspec, perturb_key,
            bitfield_dilated=occ.bitfield_dilated,
            neighbor_masks=occ.neighbor_masks,
            # lazy t materialization pays off only when the budget
            # compaction consumes t at M << N*S slots (MC probe path)
            lazy_t=budget > 0,
        )
    else:
        samples = inherited

    S = samples.mask.shape[1]
    compact = None
    if budget:
        compact = (inherited_compact if inherited_compact is not None
                   else compact_samples(
                       samples.mask, budget,
                       # march masks are per-ray prefixes EXCEPT in
                       # full-trajectory mode (S == max_steps, eval), where
                       # every lattice slot keeps its position
                       prefix=rspec.max_samples < rspec.max_steps))

    result = {
        "samples": samples,
        "compact": compact,
        # fraction of rays that exhausted the max_samples budget — a high
        # value means the occupancy grid is too dense for the padded budget
        # (e.g. density_thresh too low) and samples are being truncated
        "budget_hit_frac": jnp.mean(samples.mask[:, -1].astype(jnp.float32)),
        # mean slot utilisation of the padded [N, S] block (auto-tuner input)
        "mask_frac": jnp.mean(samples.mask.astype(jnp.float32)),
        "nears": nears,
        "fars": fars,
    }

    if compact is not None:
        # field query on the compacted M points only.  Gather ONLY t (flat
        # 1-D, full-width rows); dt is recomputed from t below — a
        # [N*S, 2] stack+gather paid a 64x tile-padding copy (minor dim 2
        # vs the (8,128) TPU tile; traced 0.41 ms/step as copy+gather).
        M = compact.idx.shape[0]
        if inherited_t_c is not None:
            # distillation teacher replay: the student already gathered
            # t at these exact compacted slots — reuse it
            t_c = inherited_t_c
        elif samples.lattice_pos is not None:
            # lazy march: gather t ONLY at the M compacted slots (the
            # [N, S] t block never materialized — see MarchedSamples)
            lat_c = samples.lattice_pos.reshape(-1)[compact.idx]
            t_c = samples.ts_flat[lat_c * N + compact.ray_id]
        else:
            t_c = samples.t.reshape(-1)[compact.idx]
        od = jnp.concatenate(
            [rays_o, rays_d, samples.t0[:, None]], axis=-1)[compact.ray_id]
        o_c, d_c, t0_c = od[:, :3], od[:, 3:6], od[:, 6]
        xyz_c = jnp.clip(o_c + t_c[:, None] * d_c, -rspec.bound, rspec.bound)
        out_f = field_forward(params, spec, xyz_c, d_c, aabb,
                              want_color=want_color)
        result.update(
            sigma_logit=out_f.sigma_logit,
            fea_sc=out_f.fea_sc,
            rgb_l=out_f.rgb,
            mask=compact.valid,
            # the compacted-slot t values, for inherited_t_c reuse by the
            # distillation teacher replay (skips its own M-row gather)
            compact_t=t_c,
            # budget utilisation (can exceed 1 pre-cap: truncation)
            compact_frac=compact.total.astype(jnp.float32) / M,
        )
        if not (want_color and composite):
            return result
        if spec.bg_radius > 0:
            polar = polar_from_ray(rays_o, rays_d, spec.bg_radius)
            bg_color = background_rgb(params, spec, polar, rays_d)
        # composite DIRECTLY on the compacted stream (segmented scan +
        # one N-row scatter-add) — the padded [N, S] block and its slow
        # >256K-row scatter-back never materialize
        dt_c = _dt_from_t(t_c, compact.valid, rspec)
        # depth channel: the running real-delta sum telescopes to
        # (t + dt) - t0 (raymarching.cu:460-465) — exact, no scan
        t_cum_c = jnp.where(compact.valid, t_c + dt_c - t0_c, 0.0)
        ws, depth_raw, image, weights = composite_rays_compact(
            out_f.sigma * rspec.density_scale, out_f.rgb, dt_c, t_cum_c,
            compact.ray_id, compact.valid, N, early_stop=early_stop,
        )
        image = image + (1.0 - ws)[:, None] * jnp.asarray(
            bg_color, image.dtype)
        depth = jnp.clip(depth_raw - nears, 0.0, None) / (fars - nears + 1e-6)
        result.update(image=image, depth=depth, weights_sum=ws,
                      weights=weights)
        return result
    else:
        xyz = sample_positions(samples, rays_o, rays_d, rspec.bound)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3))
        out_f = field_forward(
            params, spec, xyz.reshape(-1, 3), dirs.reshape(-1, 3), aabb,
            want_color=want_color,
        )
        result.update(
            sigmas=out_f.sigma.reshape(N, S),
            sigma_logit=out_f.sigma_logit.reshape(N, S),
            fea_sc=(None if out_f.fea_sc is None
                    else out_f.fea_sc.reshape(N, S, -1)),
            rgb_l=(None if out_f.rgb is None
                   else out_f.rgb.reshape(N, S, 3)),
            mask=samples.mask,
        )
        if not (want_color and composite):
            return result
        sigmas_ns = result["sigmas"]
        rgbs_ns = result["rgb_l"]
        mask_ns = samples.mask

    if spec.bg_radius > 0:
        polar = polar_from_ray(rays_o, rays_d, spec.bg_radius)
        bg_color = background_rgb(params, spec, polar, rays_d)

    ws, depth_raw, image, weights = composite_rays(
        sigmas_ns * rspec.density_scale,
        rgbs_ns,
        samples.dt,
        samples.delta_depth,
        mask_ns,
        early_stop=early_stop,
    )
    image = image + (1.0 - ws)[:, None] * jnp.asarray(bg_color, image.dtype)
    depth = jnp.clip(depth_raw - nears, 0.0, None) / (fars - nears + 1e-6)

    result.update(image=image, depth=depth, weights_sum=ws, weights=weights)
    return result


def render_stratified(
    params,
    spec: ModelSpec,
    rspec: RenderSpec,
    aabb,
    rays_o,
    rays_d,
    *,
    rng=None,
    perturb: bool = False,
    bg_color=1.0,
):
    """Fixed-count stratified render (reference `run`, renderer.py:139-317).

    Dead code in the reference (both mains force cuda_ray); first-class here
    because it is the fully dense, occupancy-free formulation — the
    CPU-runnable parity target (BASELINE config 1) and the distill-anything
    fallback when no occupancy grid exists yet.
    """
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    N = rays_o.shape[0]
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, rspec.min_near)
    # missed rays would put z at FLT_MAX; keep them finite and let weights==0
    miss = nears >= 3.0e38
    nears_s = jnp.where(miss, 0.0, nears)
    fars_s = jnp.where(miss, 1.0, fars)

    k_strat = k_pdf = None
    if rng is not None:
        k_strat, k_pdf = jax.random.split(rng)

    z, sample_dist = stratified_z_vals(
        k_strat, nears_s, fars_s, rspec.num_steps, perturb and rng is not None
    )

    def query(z_vals):
        xyz = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
        xyz = jnp.clip(xyz, aabb[:3], aabb[3:])
        dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)
        o = field_forward(
            params, spec, xyz.reshape(-1, 3), dirs.reshape(-1, 3), aabb, True
        )
        T = z_vals.shape[1]
        return o.sigma.reshape(N, T), o.rgb.reshape(N, T, 3)

    sigmas, rgbs = query(z)

    if rspec.upsample_steps > 0:
        # importance-resample around density peaks (renderer.py:200-255)
        _, weights, _ = composite_stratified(
            rspec.density_scale * lax.stop_gradient(sigmas), z, sample_dist,
            jnp.zeros((N, rspec.num_steps, 3)),
        )
        deltas = jnp.diff(z, axis=-1)
        z_mid = z[..., :-1] + 0.5 * deltas
        new_z = sample_pdf(
            k_pdf, z_mid, weights[:, 1:-1], rspec.upsample_steps,
            det=rng is None,
        )
        new_z = lax.stop_gradient(new_z)
        new_sigmas, new_rgbs = query(new_z)
        z = jnp.concatenate([z, new_z], axis=1)
        order = jnp.argsort(z, axis=1)
        z = jnp.take_along_axis(z, order, axis=1)
        sigmas = jnp.take_along_axis(
            jnp.concatenate([sigmas, new_sigmas], axis=1), order, axis=1
        )
        rgbs = jnp.take_along_axis(
            jnp.concatenate([rgbs, new_rgbs], axis=1), order[..., None], axis=1
        )

    ws, weights, image = composite_stratified(
        rspec.density_scale * sigmas, z, sample_dist, rgbs
    )

    if spec.bg_radius > 0:
        polar = polar_from_ray(rays_o, rays_d, spec.bg_radius)
        bg_color = background_rgb(params, spec, polar, rays_d)

    image = image + (1.0 - ws)[:, None] * jnp.asarray(bg_color, image.dtype)
    z_norm = jnp.clip((z - nears_s[:, None]) / (fars_s - nears_s + 1e-6)[:, None],
                      0.0, 1.0)
    depth = jnp.sum(weights * z_norm, axis=-1)
    return {"image": image, "depth": depth, "weights_sum": ws}
