"""Hash-grid encoder tests: table layout, numpy oracle, interpolation."""

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.ops import HashGridSpec, hash_encode, init_hash_table

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)
U32 = np.uint64(0xFFFFFFFF)


def numpy_oracle(table, x01, spec):
    """Independent numpy transcription of the published INGP hashing algorithm
    (multi-res grid, xor-of-primes hash, d-linear interp) for cross-checking.
    """
    N = x01.shape[0]
    L, C, D = spec.num_levels, spec.level_dim, spec.input_dim
    offsets = spec.offsets
    out = np.zeros((N, L * C), np.float32)
    oob = np.any((x01 < 0) | (x01 > 1), axis=-1)
    for lvl in range(L):
        scale = spec.level_scale(lvl)
        res = spec.level_resolution(lvl)
        hsize = int(offsets[lvl + 1] - offsets[lvl])
        side = res if spec.align_corners else res + 1
        pos = x01 * scale + (0.0 if spec.align_corners else 0.5)
        base = np.floor(pos).astype(np.uint64)
        frac = (pos - np.floor(pos)).astype(np.float64)
        acc = np.zeros((N, C), np.float64)
        for corner in range(2**D):
            w = np.ones(N, np.float64)
            cpos = base.copy()
            for d in range(D):
                if (corner >> d) & 1:
                    w *= frac[:, d]
                    cpos[:, d] += 1
                else:
                    w *= 1 - frac[:, d]
            # dense index while strides fit, else hash
            stride = 1
            idx = np.zeros(N, np.uint64)
            for d in range(D):
                if stride > hsize:
                    break
                idx = (idx + cpos[:, d] * np.uint64(stride)) & U32
                stride *= side
            if spec.gridtype == "hash" and stride > hsize:
                h = np.zeros(N, np.uint64)
                for d in range(D):
                    h ^= (cpos[:, d] * PRIMES[d]) & U32
                idx = h & U32
            rows = (idx % np.uint64(hsize)).astype(np.int64) + int(offsets[lvl])
            acc += w[:, None] * table[rows].astype(np.float64)
        out[:, lvl * C : (lvl + 1) * C] = acc.astype(np.float32)
    out[oob] = 0.0
    return out


def test_table_layout_matches_reference_math():
    spec = HashGridSpec(num_levels=14, base_resolution=16, desired_resolution=2048)
    offsets = spec.offsets
    assert len(offsets) == 15
    # level sizes are multiples of 8 and capped at 2^19
    sizes = np.diff(offsets)
    assert np.all(sizes % 8 == 0)
    assert np.all(sizes <= 2**19)
    # level 0: res 16 -> (16+1)^3 = 4913 -> round to 4920
    assert sizes[0] == 4920
    # last level reaches desired resolution
    assert spec.level_resolution(13) in (2048, 2049)


def test_matches_numpy_oracle():
    spec = HashGridSpec(
        num_levels=6, base_resolution=4, desired_resolution=64, log2_hashmap_size=7
    )
    rng = np.random.default_rng(0)
    table = rng.normal(size=(spec.table_size, spec.level_dim)).astype(np.float32)
    x = rng.uniform(-0.1, 1.1, size=(257, 3)).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(x), spec))
    want = numpy_oracle(table, x, spec)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dense_level_reproduces_linear_function():
    """A tiled grid whose entries store a linear function of the corner
    position must be reproduced exactly by d-linear interpolation."""
    spec = HashGridSpec(
        input_dim=3,
        num_levels=1,
        level_dim=1,
        base_resolution=8,
        desired_resolution=8,
        log2_hashmap_size=19,
        gridtype="tiled",
        align_corners=True,
    )
    res = spec.level_resolution(0)
    assert res == 8
    table = np.zeros((spec.table_size, 1), np.float32)
    # row-major dense indexing: idx = x + y*res + z*res^2
    for z in range(res):
        for y in range(res):
            for x in range(res):
                table[x + y * res + z * res * res, 0] = (
                    0.5 * x - 0.25 * y + 0.125 * z + 1.0
                )
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(pts), spec))[:, 0]
    g = pts * (res - 1)
    want = 0.5 * g[:, 0] - 0.25 * g[:, 1] + 0.125 * g[:, 2] + 1.0
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_oob_inputs_are_zero():
    spec = HashGridSpec(num_levels=2, base_resolution=4, desired_resolution=8)
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, spec)
    x = jnp.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
    out = np.asarray(hash_encode(table, x, spec))
    assert np.any(out[0] != 0)
    np.testing.assert_array_equal(out[1], 0)
    np.testing.assert_array_equal(out[2], 0)


def test_gradients_flow_to_table():
    spec = HashGridSpec(num_levels=3, base_resolution=4, desired_resolution=16)
    key = jax.random.PRNGKey(1)
    table = init_hash_table(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

    def loss(tab):
        return jnp.sum(hash_encode(tab, x, spec) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_baked_dense_matches_exact_on_fine_level():
    """build_baked_dense: the finest dense level is reproduced exactly,
    non-dense levels are untouched, oob rows stay zero, and coarser dense
    levels are a trilinear resample (exact at fine-lattice vertices)."""
    from pvd_tpu.ops.hashgrid import baked_dense_plan, build_baked_dense

    spec = HashGridSpec(num_levels=6, base_resolution=4,
                        desired_resolution=64, log2_hashmap_size=10)
    fine, dense = baked_dense_plan(spec)
    assert len(dense) >= 2, "config must produce >=2 dense levels"
    table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e4
    baked, f2, d2 = build_baked_dense(table, spec)
    assert (f2, d2) == (fine, dense)

    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3),
                           minval=-0.1, maxval=1.1)
    ref = np.asarray(hash_encode(table, x, spec))
    bak = np.asarray(hash_encode(table, x, spec,
                                 prebuilt_baked=(baked, fine, dense)))
    C = spec.level_dim
    np.testing.assert_allclose(bak[:, fine * C:(fine + 1) * C],
                               ref[:, fine * C:(fine + 1) * C],
                               rtol=1e-5, atol=1e-4)
    for lvl in range(spec.num_levels):
        if lvl not in dense:
            np.testing.assert_array_equal(bak[:, lvl * C:(lvl + 1) * C],
                                          ref[:, lvl * C:(lvl + 1) * C])
    oob = np.asarray(((x < 0) | (x > 1)).any(axis=1))
    assert oob.any()
    np.testing.assert_array_equal(bak[oob], 0.0)
    # coarse-level resample error is bounded by within-cell variation; on a
    # U(-1,1)-scale random table it must stay well under the signal scale
    for lvl in dense[:-1]:
        err = np.abs(bak[:, lvl * C:(lvl + 1) * C]
                     - ref[:, lvl * C:(lvl + 1) * C])
        assert err.mean() < 0.35 * np.abs(ref[:, lvl * C:(lvl + 1) * C]).mean()


def test_baked_dense_exact_at_fine_vertices():
    """At virtual positions of fine-lattice vertices every dense level's
    baked value equals the exact encode (the bake samples there)."""
    from pvd_tpu.ops.hashgrid import baked_dense_plan, build_baked_dense

    spec = HashGridSpec(num_levels=5, base_resolution=4,
                        desired_resolution=32, log2_hashmap_size=12)
    fine, dense = baked_dense_plan(spec)
    table = init_hash_table(jax.random.PRNGKey(3), spec) * 1e4
    baked, _, _ = build_baked_dense(table, spec)
    scale_f = spec.level_scale(fine)
    # interior vertices only (edge vertices extrapolate the coarse levels)
    v = np.arange(2, 12, dtype=np.float64)
    x1 = (v - 0.5) / scale_f
    g = np.stack(np.meshgrid(x1[:4], x1[:4], x1[:4], indexing="ij"),
                 axis=-1).reshape(-1, 3)
    ref = np.asarray(hash_encode(table, jnp.asarray(g), spec))
    bak = np.asarray(hash_encode(table, jnp.asarray(g), spec,
                                 prebuilt_baked=(baked, fine, dense)))
    C = spec.level_dim
    for lvl in dense:
        np.testing.assert_allclose(bak[:, lvl * C:(lvl + 1) * C],
                                   ref[:, lvl * C:(lvl + 1) * C],
                                   rtol=1e-4, atol=2e-3)
