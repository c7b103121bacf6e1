"""Neighborhood packing equals corner-wise sampling (incl. zero padding)."""

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.ops import HashGridSpec, hash_encode
from pvd_tpu.ops.grid_sample import grid_sample_1d, grid_sample_2d
from pvd_tpu.ops.packing import (
    pack_line,
    pack_plane,
    pack_rows_3d,
    sample_packed_line,
    sample_packed_plane,
)


def test_packed_plane_matches_grid_sample():
    rng = np.random.default_rng(0)
    H, W, C, N = 19, 23, 7, 500
    plane = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    pts = rng.uniform(-1.3, 1.3, size=(N, 2)).astype(np.float32)  # incl. OOB
    want = np.asarray(grid_sample_2d(plane, jnp.asarray(pts)))

    px = (pts[:, 0] + 1) * 0.5 * (W - 1)
    py = (pts[:, 1] + 1) * 0.5 * (H - 1)
    got = np.asarray(
        sample_packed_plane(pack_plane(plane), H, W, C,
                            jnp.asarray(px), jnp.asarray(py))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_packed_line_matches_grid_sample():
    rng = np.random.default_rng(1)
    L, C, N = 31, 5, 400
    line = jnp.asarray(rng.normal(size=(L, C)).astype(np.float32))
    z = rng.uniform(-1.2, 1.2, size=(N,)).astype(np.float32)
    want = np.asarray(grid_sample_1d(line, jnp.asarray(z)))
    p = (z + 1) * 0.5 * (L - 1)
    got = np.asarray(sample_packed_line(pack_line(line), L, C, jnp.asarray(p)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pack_rows_3d_layout():
    s, C = 4, 2
    rng = np.random.default_rng(2)
    rows = rng.normal(size=(s**3, C)).astype(np.float32)
    packed = np.asarray(pack_rows_3d(jnp.asarray(rows), s, C))
    # check corner k of cell (x,y,z): bit0=dx, bit1=dy, bit2=dz
    for (x, y, z) in [(0, 0, 0), (1, 2, 3), (2, 1, 0)]:
        cell = z * s * s + y * s + x
        for k in range(8):
            dx, dy, dz = k & 1, (k >> 1) & 1, (k >> 2) & 1
            nx, ny, nz = x + dx, y + dy, z + dz
            want = (
                rows[nz * s * s + ny * s + nx]
                if max(nx, ny, nz) < s else np.zeros(C)
            )
            np.testing.assert_allclose(
                packed[cell, k * C:(k + 1) * C], want, atol=1e-6
            )


def test_hash_encode_packed_matches_unpacked():
    spec = HashGridSpec(
        num_levels=6, base_resolution=4, desired_resolution=64,
        log2_hashmap_size=7,
    )
    rng = np.random.default_rng(3)
    table = jnp.asarray(
        rng.normal(size=(spec.table_size, spec.level_dim)).astype(np.float32)
    )
    x = jnp.asarray(rng.uniform(-0.1, 1.1, size=(257, 3)).astype(np.float32))
    a = np.asarray(hash_encode(table, x, spec, packed_dense=True))
    b = np.asarray(hash_encode(table, x, spec, packed_dense=False))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_hash_encode_packed_gradients_match():
    spec = HashGridSpec(num_levels=3, base_resolution=4, desired_resolution=16)
    rng = np.random.default_rng(4)
    table = jnp.asarray(
        rng.normal(size=(spec.table_size, spec.level_dim)).astype(np.float32)
    )
    x = jnp.asarray(rng.uniform(0, 1, size=(64, 3)).astype(np.float32))

    def loss(tab, packed):
        return jnp.sum(hash_encode(tab, x, spec, packed_dense=packed) ** 2)

    g1 = np.asarray(jax.grad(loss)(table, True))
    g2 = np.asarray(jax.grad(loss)(table, False))
    np.testing.assert_allclose(g1, g2, atol=3e-5)
