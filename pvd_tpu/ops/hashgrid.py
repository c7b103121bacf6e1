"""Multi-resolution hash-grid encoding (INGP), TPU-native.

Replaces the gridencoder CUDA extension (gridencoder/src/gridencoder.cu:75-343
and the table-layout math in gridencoder/grid.py:176-196).  The table layout,
per-level scales, corner weighting and the xor-of-primes spatial hash are kept
numerically identical so checkpoints and PSNR can be cross-validated; the
execution strategy is completely different: per level a [N, 2^D] gather from
one flat embedding table followed by a weighted sum, with gradients flowing
through XLA's gather/scatter-add transpose instead of hand-written fp16
atomics.

Key exactness notes:
  * per_level_scale S is derived from desired_resolution so that level
    (L-1) hits desired_res: S = exp2(log2(desired/base)/(L-1)).
  * scale_l = exp2(l*S)*H - 1, resolution_l = ceil(scale_l)+1.
  * params_in_level = min(2^log2_hashmap_size, (res_l + 1)^D) rounded UP to a
    multiple of 8 (grid.py:188-190) — this rounding is load-bearing for
    checkpoint shape parity.
  * dense (row-major) indexing is used while the per-dim stride still fits in
    the level's table; otherwise the xor-prime hash {1, 2654435761, 805459861}
    takes over, all in wrapping uint32 arithmetic.
  * inputs outside [0,1]^D produce zeros for every level.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)
_U32 = np.uint64(0xFFFFFFFF)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    input_dim: int = 3
    num_levels: int = 14
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 2048
    gridtype: str = "hash"  # "hash" | "tiled"
    align_corners: bool = False
    # TPU fast mode: the finest `n_cell_levels` hashed levels store each
    # CELL's 2^D corner features in one table row (ONE gather per point
    # instead of 2^D), hashed by the cell base coordinate.  The cell table
    # is 2^D-fold narrower-in-rows/wider-in-columns, so the parameter count
    # per level is unchanged.  Features become C0-discontinuous across cell
    # boundaries — restrict to levels whose cells are subpixel at render
    # resolution.  0 = exact reference parity.
    n_cell_levels: int = 0
    # Cast tables to this dtype before gathering (params stay float32 for
    # the optimizer).  Measured on v5e: bf16 rows gather 2x SLOWER than f32
    # (the engine punishes sub-word elements), so None (no cast) is the
    # production setting; the knob stays for future hardware.
    gather_dtype: str | None = None

    @property
    def log2_cell_size(self) -> int:
        return self.log2_hashmap_size - self.input_dim

    def level_is_hashed(self, level: int) -> bool:
        # side^D > cap <=> the kernel's running stride outgrows the table
        side = self.level_resolution(level) + (0 if self.align_corners else 1)
        return (
            self.gridtype == "hash"
            and side**self.input_dim > 2**self.log2_hashmap_size
        )

    def is_cell_level(self, level: int) -> bool:
        return (
            self.n_cell_levels > 0
            and level >= self.num_levels - self.n_cell_levels
            and self.level_is_hashed(level)
        )

    @property
    def per_level_scale(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp2(
                np.log2(self.desired_resolution / self.base_resolution)
                / (self.num_levels - 1)
            )
        )

    @property
    def log2_per_level_scale(self) -> float:
        return float(np.log2(self.per_level_scale))

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_scale(self, level: int) -> float:
        return float(
            np.exp2(level * self.log2_per_level_scale) * self.base_resolution - 1.0
        )

    def level_resolution(self, level: int) -> int:
        return int(np.ceil(self.level_scale(level))) + 1

    @property
    def offsets(self) -> np.ndarray:
        """Cumulative level offsets [L+1] in the corner table, int64
        (grid.py:176-196).  Cell-mode levels occupy zero rows here — their
        storage lives in the separate cell table."""
        offsets = [0]
        offset = 0
        max_params = 2**self.log2_hashmap_size
        for lvl in range(self.num_levels):
            if self.is_cell_level(lvl):
                offsets.append(offset)
                continue
            res = int(np.ceil(self.base_resolution * self.per_level_scale**lvl))
            n = min(
                max_params,
                (res if self.align_corners else res + 1) ** self.input_dim,
            )
            n = int(np.ceil(n / 8) * 8)
            offset += n
            offsets.append(offset)
        return np.asarray(offsets, np.int64)

    @property
    def table_size(self) -> int:
        return int(self.offsets[-1])

    @property
    def cell_levels(self):
        return [l for l in range(self.num_levels) if self.is_cell_level(l)]

    @property
    def cell_rows_per_level(self) -> int:
        return 2**self.log2_cell_size

    @property
    def cell_table_size(self) -> int:
        return len(self.cell_levels) * self.cell_rows_per_level


def init_hash_table(rng, spec: HashGridSpec, dtype=jnp.float32):
    """U(-1e-4, 1e-4) init, matching grid.py:200-202."""
    return jax.random.uniform(
        rng,
        (spec.table_size, spec.level_dim),
        minval=-1e-4,
        maxval=1e-4,
        dtype=dtype,
    )


def _level_corner_plan(spec: HashGridSpec, level: int):
    """Static per-level indexing plan (resolution, strides, hash decision).

    The CUDA kernel decides dense-vs-hash at runtime from a running stride;
    resolutions are static here so the decision (and the wrapped strides)
    are computed exactly in Python integers.  Notes that make the device
    arithmetic cheap:
      * dense levels never need the final modulo — the row-major index is
        < side^D <= level size by construction;
      * hashed levels always have size exactly 2^log2_hashmap_size (the cap
        was hit), so the modulo is a power-of-two AND;
      * the xor-prime hash wraps mod 2^32, which int32 ops do natively.
    """
    D = spec.input_dim
    res = spec.level_resolution(level)
    hashmap_size = int(spec.offsets[level + 1] - spec.offsets[level])
    side = res if spec.align_corners else res + 1
    strides = []
    stride = 1
    use_dim = []
    for _ in range(D):
        use_dim.append(stride <= hashmap_size)
        strides.append(stride & int(_U32))
        stride *= side
    use_hash = spec.gridtype == "hash" and stride > hashmap_size
    if use_hash:
        assert hashmap_size == 2**spec.log2_hashmap_size, (
            "hashed level size must be the power-of-two cap"
        )
    return res, hashmap_size, strides, use_dim, use_hash


def _i32(v: int) -> jnp.ndarray:
    return jnp.int32(np.int64(v & int(_U32)).astype(np.uint32).view(np.int32))


def _corner_rows(corners, spec: HashGridSpec, level: int):
    """corners: [N, 2^D, D] int32 coords -> [N, 2^D] table rows (int32)."""
    _, hashmap_size, strides, use_dim, use_hash = _level_corner_plan(spec, level)
    if use_hash:
        h = jnp.zeros(corners.shape[:-1], jnp.int32)
        for d in range(spec.input_dim):
            h = h ^ (corners[..., d] * _i32(_PRIMES[d]))
        return h & jnp.int32(hashmap_size - 1)
    index = jnp.zeros(corners.shape[:-1], jnp.int32)
    for d in range(spec.input_dim):
        if use_dim[d]:
            index = index + corners[..., d] * _i32(strides[d])
    if all(use_dim):
        # fully dense level: index < side^D <= level size, no modulo needed
        return index
    # capped tiled level (stride outgrew the table): modulo like the kernel
    return jnp.where(index < 0, index + jnp.int32(hashmap_size), index) \
        % jnp.int32(hashmap_size)


def _is_dense(spec: HashGridSpec, level: int) -> bool:
    return not _level_corner_plan(spec, level)[4]


# ---- corner gather with a scatter-folding backward -----------------------
#
# TPU layout facts driving these formulations (measured on v5e):
#   * the gather engine is row-rate-bound (~230M rows/s for <=64B rows,
#     ~320M rows/s for 32B rows) but ONLY when the gather's index is 1-D and
#     its output is consumed without lane-dim reshapes; a [N, K] index or a
#     downstream [N*K, C] -> [N, K, C] reshape halves the rate (lane repack).
#     So all gathers here use a CORNER-MAJOR flat index whose output reshape
#     [K*N, C] -> [K, N, C] splits only the major dim (free).
#   * weighted sums across a ROW's packed corners use tiny 0/1 matmuls
#     instead of [.., K, C] reshapes — the MXU is free at these sizes and
#     matmuls avoid lane repacks entirely.
#   * XLA's TPU scatter-add costs ~20-25ns per updated ROW once the
#     destination is <=~256K rows, and ~4x that for larger tables.  Backward
#     scatters go per level, FOLDING any level larger than _SCATTER_CHUNK
#     rows into a [size/F, F*C] view (the update value is widened with a
#     one-hot slot mask) so every scatter stays in the fast regime.

_SCATTER_CHUNK = 262144


def _repeat_mat(K: int, C: int, dtype):
    """[K, K*C] 0/1 matrix: w [N, K] @ R -> w repeated C times per corner."""
    R = np.zeros((K, K * C), np.float32)
    for k in range(K):
        R[k, k * C : (k + 1) * C] = 1.0
    return jnp.asarray(R, dtype)


def _sum_mat(K: int, C: int, dtype):
    """[K*C, C] 0/1 matrix: (vals*wrep) @ S sums the K corner blocks."""
    S = np.zeros((K * C, C), np.float32)
    for k in range(K):
        for c in range(C):
            S[k * C + c, c] = 1.0
    return jnp.asarray(S, dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _corner_gather_sum(table, rows, w, level_offsets, n_corners, gather_dtype):
    """out[l, n, :] = sum_k w[n, l*K+k] * table[rows[n, l*K+k], :].

    rows/w: [N, L*K] level-major.  Returns [L, N, C] (level-major — callers
    index per level, avoiding an [N, L, C] transpose).
    """
    K = n_corners
    N = rows.shape[0]
    L = rows.shape[1] // K
    C = table.shape[1]
    src = table.astype(gather_dtype) if gather_dtype else table
    # corner-major flat gather: [(L*K)*N, C] -> major-split to [L*K, N, C].
    # mode="clip": jnp.take's default fill mode produces NaN rows for
    # out-of-bounds indices (oob inputs); oob zeroing is done by the w mask
    vals = jnp.take(src, rows.T.reshape(-1), axis=0,
                    mode="clip").reshape(L * K, N, C)
    # bf16 saves gather BYTES; the weighted sum upcasts to f32 (free)
    wv = vals.astype(jnp.float32) * w.T[..., None]  # [L*K, N, C]
    return wv.reshape(L, K, N, C).sum(axis=1).astype(table.dtype)


def _corner_gather_sum_fwd(table, rows, w, level_offsets, n_corners,
                           gather_dtype):
    out = _corner_gather_sum(table, rows, w, level_offsets, n_corners,
                             gather_dtype)
    return out, (table, rows, w)


def _corner_gather_sum_bwd(level_offsets, n_corners, gather_dtype, res, g):
    table, rows, w = res
    K = n_corners
    N, total = rows.shape
    L = total // K
    C = table.shape[1]
    src = table.astype(gather_dtype) if gather_dtype else table
    vals = jnp.take(src, rows.T.reshape(-1), axis=0,
                    mode="clip").reshape(L * K, N, C)
    # g: [L, N, C] -> corner-major [L*K, N, C]
    g_rep = jnp.repeat(g, K, axis=0)
    g_w = jnp.sum(vals.astype(g_rep.dtype) * g_rep, axis=-1)  # [L*K, N]
    g_w = g_w.T.astype(w.dtype)
    g_vals = g_rep * w.T[..., None].astype(g_rep.dtype)  # [L*K, N, C]

    parts = [jnp.zeros((int(level_offsets[0]), C), table.dtype)]
    for li in range(L):
        off = int(level_offsets[li])
        size = int(level_offsets[li + 1]) - off
        rows_l = rows[:, li * K : (li + 1) * K].T.reshape(-1) - jnp.int32(off)
        gv_l = g_vals[li * K : (li + 1) * K].reshape(-1, C).astype(table.dtype)
        fold = 1
        while size // fold > _SCATTER_CHUNK and size % (fold * 2) == 0:
            fold *= 2
        if fold == 1:
            parts.append(
                jnp.zeros((size, C), table.dtype).at[rows_l].add(gv_l,
                                                                 mode="drop")
            )
        else:
            slot = rows_l % fold
            onehot = (slot[:, None] == jnp.arange(fold)[None, :]).astype(
                table.dtype)
            wide = (onehot[:, :, None] * gv_l[:, None, :]).reshape(
                -1, fold * C)
            acc = jnp.zeros((size // fold, fold * C), table.dtype).at[
                rows_l // fold].add(wide, mode="drop")
            parts.append(acc.reshape(size, C))
    pad = table.shape[0] - int(level_offsets[L])
    if pad:
        parts.append(jnp.zeros((pad, C), table.dtype))
    g_table = jnp.concatenate(parts, axis=0)
    return g_table, None, g_w


_corner_gather_sum.defvjp(_corner_gather_sum_fwd, _corner_gather_sum_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _cell_gather_sum(cell_table, rows, w, rows_per_level, n_corners,
                     gather_dtype):
    """out[l][n, :] = sum_k w[n, l, k] * cell_table[rows[n, l], k*C:(k+1)*C].

    One gather per (point, cell level); rows [N, L]; w [N, L, K].
    Returns [L, N, C] level-major.
    """
    K = n_corners
    N, L = rows.shape
    KC = cell_table.shape[1]
    C = KC // K
    src = cell_table.astype(gather_dtype) if gather_dtype else cell_table
    vals = jnp.take(src, rows.T.reshape(-1), axis=0,
                    mode="clip").reshape(L, N, KC)
    R = _repeat_mat(K, C, jnp.float32)
    S = _sum_mat(K, C, jnp.float32)
    outs = []
    for li in range(L):
        wrep = w[:, li, :] @ R  # [N, K*C]
        outs.append((vals[li].astype(jnp.float32) * wrep) @ S)  # [N, C]
    return jnp.stack(outs, axis=0).astype(cell_table.dtype)


def _cell_gather_sum_fwd(cell_table, rows, w, rows_per_level, n_corners,
                         gather_dtype):
    return _cell_gather_sum(cell_table, rows, w, rows_per_level, n_corners,
                            gather_dtype), (cell_table, rows, w)


def _cell_gather_sum_bwd(rows_per_level, n_corners, gather_dtype, res, g):
    cell_table, rows, w = res
    K = n_corners
    N, L = rows.shape
    KC = cell_table.shape[1]
    C = KC // K
    src = cell_table.astype(gather_dtype) if gather_dtype else cell_table
    vals = jnp.take(src, rows.T.reshape(-1), axis=0,
                    mode="clip").reshape(L, N, KC)
    R = _repeat_mat(K, C, jnp.float32)
    S = _sum_mat(K, C, jnp.float32)
    parts = []
    g_ws = []
    for li in range(L):
        g_l = g[li].astype(jnp.float32)  # [N, C]
        g_rep = g_l @ S.T  # [N, K*C] — broadcast g to every corner block
        v_l = vals[li].astype(jnp.float32)
        # dL/dw[n,k] = sum_c g[n,c] * vals[n, k*C+c]
        g_ws.append((v_l * g_rep) @ R.T)  # [N, K]
        wrep = (w[:, li, :] @ R)  # [N, K*C]
        gv_l = (g_rep * wrep).astype(cell_table.dtype)
        off = li * rows_per_level
        parts.append(
            jnp.zeros((rows_per_level, KC), cell_table.dtype)
            .at[rows[:, li] - jnp.int32(off)]
            .add(gv_l, mode="drop")
        )
    g_w = jnp.stack(g_ws, axis=1).astype(w.dtype)  # [N, L, K]
    return jnp.concatenate(parts, axis=0), None, g_w


_cell_gather_sum.defvjp(_cell_gather_sum_fwd, _cell_gather_sum_bwd)


def init_cell_table(rng, spec: HashGridSpec, dtype=jnp.float32):
    """U(-1e-4, 1e-4) init for the cell-mode levels' table."""
    D = spec.input_dim
    return jax.random.uniform(
        rng,
        (spec.cell_table_size, (2**D) * spec.level_dim),
        minval=-1e-4, maxval=1e-4, dtype=dtype,
    )


def packed_level_offsets(spec: HashGridSpec):
    """Static {dense_level: row offset} map into the packed-dense table."""
    packed_offsets, off = {}, 0
    for level in range(spec.num_levels):
        if spec.is_cell_level(level) or not _is_dense(spec, level) \
                or spec.input_dim != 3:
            continue
        res, _, _, _, _ = _level_corner_plan(spec, level)
        side = res if spec.align_corners else res + 1
        packed_offsets[level] = off
        off += side**3
    return packed_offsets


def build_packed_dense(table, spec: HashGridSpec, dtype=None):
    """Neighborhood-pack all dense levels into one [sum side^3, 8C] table.

    Frozen models (the distillation teacher) should call this ONCE and pass
    the result to hash_encode(prebuilt_packed=...) — rebuilding in-graph
    costs a full-table pass per step.  Returns (packed, level_offsets) or
    (None, {}) when no level is dense.
    """
    from pvd_tpu.ops.packing import pack_rows_3d

    C = spec.level_dim
    offsets = spec.offsets
    parts, packed_offsets, off = [], {}, 0
    for level in range(spec.num_levels):
        if spec.is_cell_level(level) or not _is_dense(spec, level) \
                or spec.input_dim != 3:
            continue
        res, _, _, _, _ = _level_corner_plan(spec, level)
        side = res if spec.align_corners else res + 1
        part = pack_rows_3d(
            table[int(offsets[level]): int(offsets[level]) + side**3],
            side, C,
        )
        parts.append(part.astype(dtype) if dtype else part)
        packed_offsets[level] = off
        off += side**3
    if not parts:
        return None, {}
    return jnp.concatenate(parts, axis=0), packed_offsets


def baked_dense_plan(spec: HashGridSpec):
    """Static (fine_level, dense_levels) plan for build_baked_dense."""
    dense_levels = tuple(
        l for l in range(spec.num_levels)
        if not spec.is_cell_level(l) and _is_dense(spec, l)
        and spec.input_dim == 3
    )
    return (dense_levels[-1] if dense_levels else -1), dense_levels


def build_baked_dense(table, spec: HashGridSpec, dtype=None):
    """Bake ALL dense levels onto the FINEST dense level's lattice.

    For a FROZEN table (the distillation teacher) the per-level dense
    gathers can be merged into ONE: each vertex of the finest dense level
    stores every dense level's feature evaluated at that vertex, and the
    whole lattice is neighborhood-packed (pack_rows_3d), so the encode
    fetches one [8 * Ld * C]-wide row per point.  The TPU gather engine is
    row-rate-bound at these widths (~210M rows/s for 16B-256B rows, faster
    at 512B — measured v5e), so Ld levels cost the price of one.

    Exactness: the finest dense level is reproduced bit-identically (its
    own vertices are copied).  Coarser levels are resampled onto the finer
    lattice: trilinear interpolation restricted to an axis-aligned box is
    still trilinear in the box's local coordinates, so the baked value is
    EXACT for every fine cell that does not straddle a coarse cell
    boundary, and a C0 smoothing of the coarse field across boundaries
    inside straddling cells (the same discontinuity class cell mode
    accepts).  Teacher-side approximation only — quality must be A/B'd.

    Returns (baked [side_f^3, 8*Ld*C], fine_level, dense_levels) or
    (None, -1, ()) when no level is dense.
    """
    from pvd_tpu.ops.packing import pack_rows_3d

    C = spec.level_dim
    offsets = spec.offsets
    fine, dense_levels = baked_dense_plan(spec)
    if not dense_levels:
        return None, -1, ()
    res_f, _, _, _, _ = _level_corner_plan(spec, fine)
    side_f = res_f if spec.align_corners else res_f + 1
    o = 0.0 if spec.align_corners else 0.5
    scale_f = spec.level_scale(fine)
    v = np.arange(side_f, dtype=np.float64)
    x01_axis = (v - o) / scale_f  # virtual position of each fine vertex

    feats = []
    for level in dense_levels:
        off = int(offsets[level])
        res_l, _, _, _, _ = _level_corner_plan(spec, level)
        side_l = res_l if spec.align_corners else res_l + 1
        if level == fine:
            feats.append(table[off: off + side_f**3])
            continue
        pos = x01_axis * spec.level_scale(level) + o
        b = np.clip(np.floor(pos).astype(np.int64), 0, side_l - 2)
        f = jnp.asarray(pos - b, jnp.float32)  # may extrapolate at edges
        bj = jnp.asarray(b, jnp.int32)
        sub = table[off: off + side_l**3]
        acc = 0.0
        for k in range(8):
            dx, dy, dz = k & 1, (k >> 1) & 1, (k >> 2) & 1
            idx = (
                (bj + dx)[None, None, :]
                + (bj + dy)[None, :, None] * jnp.int32(side_l)
                + (bj + dz)[:, None, None] * jnp.int32(side_l * side_l)
            ).reshape(-1)
            w = (
                (f if dx else 1.0 - f)[None, None, :]
                * (f if dy else 1.0 - f)[None, :, None]
                * (f if dz else 1.0 - f)[:, None, None]
            ).reshape(-1, 1)
            acc = acc + jnp.take(sub, idx, axis=0) * w
        feats.append(acc.astype(table.dtype))
    vert = jnp.concatenate(feats, axis=-1)  # [side_f^3, Ld*C]
    baked = pack_rows_3d(vert, side_f, C * len(dense_levels))
    if dtype:
        baked = baked.astype(dtype)
    return baked, fine, dense_levels


def hash_encode(table, x01, spec: HashGridSpec, packed_dense: bool = True,
                cell_table=None, prebuilt_packed=None, prebuilt_baked=None):
    """Encode points through all levels.

    Args:
      table: [table_size, level_dim] embeddings.
      x01: [N, D] positions normalized to [0, 1] (callers map from
           [-bound, bound]; see grid.py:207-211).
      spec: HashGridSpec.
      packed_dense: fetch each dense level's 2^D interpolation corners as
        ONE neighborhood-packed row (ops/packing.py) instead of 2^D rows —
        8x fewer gathers for those levels, identical math and parameters
        (the packed table is built inside the graph each call).
      prebuilt_packed: optional (packed, level_offsets) from
        build_packed_dense for FROZEN tables — skips the in-graph rebuild
        (no gradient flows to dense levels through this path).

    Returns:
      [N, num_levels * level_dim]; zero rows for out-of-range inputs.

    TPU shape: the gather engine is rate-limited per row, so corner rows
    and weights for ALL levels are computed with elementwise int32/f32 ops
    and collapsed into at most two gathers: one over the packed-dense
    table, one [N, L_hash*2^D] over the flat table for hashed levels.
    All gathers use corner-major FLAT indices (2-D indices and lane-dim
    reshapes halve the TPU gather rate — see _corner_gather_sum).
    """
    D = spec.input_dim
    C = spec.level_dim
    N = x01.shape[0]
    x01 = jnp.asarray(x01, jnp.float32)
    # oob zeroing (gridencoder.cu:98-123: out-of-[0,1] inputs -> 0 for every
    # level) is folded into the interpolation WEIGHTS: a post-concat
    # jnp.where on the [N, L*C] output measured 2.6 ms/step on v5e (it
    # forces a relayout of the oddly-shaped concat), while w * okf fuses
    # into the weight computation for free.  Gathers use mode="clip" so oob
    # indices read an arbitrary in-bounds row (finite) and the zero weight
    # produces an exact 0.
    okf = 1.0 - jnp.any((x01 < 0.0) | (x01 > 1.0),
                        axis=-1).astype(jnp.float32)[:, None]  # [N, 1]
    offsets = spec.offsets

    # Corner offsets [2^D, D]: bit d of corner id selects +1 along dim d.
    corner_bits = np.arange(2**D, dtype=np.int32)
    corner_off = np.stack([(corner_bits >> d) & 1 for d in range(D)], axis=-1)
    sel = jnp.asarray(corner_off, jnp.float32)  # [2^D, D]

    level_out: list = [None] * spec.num_levels
    hashed_rows, hashed_w, hashed_levels = [], [], []
    dense_base, dense_w, dense_levels = [], [], []
    cell_rows, cell_w, cell_levels = [], [], []
    baked_fine = prebuilt_baked[1] if prebuilt_baked is not None else -1
    baked_skip = set(prebuilt_baked[2]) - {baked_fine} \
        if prebuilt_baked is not None else set()

    for level in range(spec.num_levels):
        if level in baked_skip:
            continue  # fetched via the baked fine-level row
        scale = spec.level_scale(level)
        pos = x01 * scale + (0.0 if spec.align_corners else 0.5)
        base = jnp.floor(pos)
        frac = pos - base  # [N, D]
        base_i = base.astype(jnp.int32)  # in-range inputs are non-negative
        # d-linear weights: prod over dims of (frac or 1-frac)
        w = jnp.prod(
            sel[None] * frac[:, None, :]
            + (1.0 - sel[None]) * (1.0 - frac[:, None, :]),
            axis=-1,
        ) * okf  # [N, 2^D]; okf zeroes out-of-range inputs

        if spec.is_cell_level(level):
            assert cell_table is not None, "cell levels need a cell_table"
            h = jnp.zeros((x01.shape[0],), jnp.int32)
            for dd in range(D):
                h = h ^ (base_i[:, dd] * _i32(_PRIMES[dd]))
            h = h & jnp.int32(spec.cell_rows_per_level - 1)
            cell_rows.append(
                h + jnp.int32(len(cell_levels) * spec.cell_rows_per_level)
            )
            cell_w.append(w)
            cell_levels.append(level)
        elif (packed_dense or prebuilt_packed is not None) and D == 3 \
                and _is_dense(spec, level):
            res, _, strides, _, _ = _level_corner_plan(spec, level)
            side = res if spec.align_corners else res + 1
            flat = (
                base_i[:, 0]
                + base_i[:, 1] * jnp.int32(side)
                + base_i[:, 2] * jnp.int32(side * side)
            )
            dense_base.append(flat)
            dense_w.append(w)
            dense_levels.append(level)
        else:
            corners = base_i[:, None, :] + jnp.asarray(corner_off)
            hashed_rows.append(_corner_rows(corners, spec, level)
                               + jnp.int32(offsets[level]))
            hashed_w.append(w)
            hashed_levels.append(level)

    gd = jnp.dtype(spec.gather_dtype) if spec.gather_dtype else None

    if prebuilt_baked is not None and dense_levels:
        # one [8 * Ld * C]-wide row per point from the baked fine lattice
        baked, fine, all_dense = prebuilt_baked
        assert dense_levels == [fine], "baked mode expects only the fine level"
        Ld = len(all_dense)
        vals = jnp.take(baked, dense_base[0], axis=0, mode="clip")  # [N, 8*Ld*C]
        wrep = dense_w[0] @ _repeat_mat(8, Ld * C, jnp.float32)
        out = (vals.astype(jnp.float32) * wrep) @ _sum_mat(8, Ld * C,
                                                           jnp.float32)
        for j, level in enumerate(all_dense):
            level_out[level] = out[:, j * C: (j + 1) * C]
        dense_levels = []

    if dense_levels:
        if prebuilt_packed is not None:
            packed, packed_off = prebuilt_packed
        else:
            packed, packed_off = build_packed_dense(table, spec, dtype=gd)
        # corner-major flat gather -> [Ld, N, 8C] (major split only)
        Ld = len(dense_levels)
        rows = jnp.concatenate(
            [b + jnp.int32(packed_off[lv]) for b, lv in
             zip(dense_base, dense_levels)], axis=0)  # [Ld*N] level-major
        vals = jnp.take(packed, rows, axis=0, mode="clip").reshape(Ld, N,
                                                                   8 * C)
        R = _repeat_mat(8, C, jnp.float32)
        S = _sum_mat(8, C, jnp.float32)
        for i, level in enumerate(dense_levels):
            wrep = dense_w[i] @ R  # [N, 8C]
            level_out[level] = (vals[i].astype(jnp.float32) * wrep) @ S

    if hashed_levels:
        rows = jnp.concatenate(hashed_rows, axis=1)  # [N, Lh*2^D]
        w = jnp.concatenate(hashed_w, axis=1)
        # routed levels are contiguous in the table; (Lh+1) absolute offsets
        lvl_offsets = tuple(
            int(offsets[level]) for level in hashed_levels
        ) + (int(offsets[hashed_levels[-1] + 1]),)
        outs = _corner_gather_sum(table, rows, w, lvl_offsets, 2**D,
                                  spec.gather_dtype)
        for i, level in enumerate(hashed_levels):
            level_out[level] = outs[i]

    if cell_levels:
        rows = jnp.stack(cell_rows, axis=1)  # [N, Lc]
        w = jnp.stack(cell_w, axis=1)  # [N, Lc, 2^D]
        outs = _cell_gather_sum(
            cell_table, rows, w, spec.cell_rows_per_level, 2**D,
            spec.gather_dtype,
        )
        for i, level in enumerate(cell_levels):
            level_out[level] = outs[i]

    return jnp.concatenate(level_out, axis=-1)  # [N, L*C]; oob rows are 0
