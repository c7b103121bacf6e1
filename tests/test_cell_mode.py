"""Cell-packed fast-mode hashed levels: correctness of the 1-gather path."""

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec
from pvd_tpu.models import field_forward, init_field
from pvd_tpu.ops.hashgrid import (
    HashGridSpec,
    hash_encode,
    init_cell_table,
    init_hash_table,
)

AABB = jnp.array([-1.0, -1, -1, 1, 1, 1])


def _spec(n_cell):
    return HashGridSpec(
        num_levels=6, base_resolution=4, desired_resolution=64,
        log2_hashmap_size=9, n_cell_levels=n_cell,
    )


def test_layout_shrinks_corner_table():
    s0, s2 = _spec(0), _spec(2)
    assert s2.table_size < s0.table_size
    assert len(s2.cell_levels) == 2
    assert s2.cell_table_size == 2 * 2**6  # log2 9 - 3
    # cell levels are the finest hashed ones
    assert all(s2.level_is_hashed(l) for l in s2.cell_levels)


def plain_cell_encode(table, cell_table, x01, spec):
    """Autodiff-reference implementation of the cell path (no custom vjp)."""
    import pvd_tpu.ops.hashgrid as hg

    D, C = spec.input_dim, spec.level_dim
    N = x01.shape[0]
    corner_bits = np.arange(2**D, dtype=np.int32)
    corner_off = np.stack([(corner_bits >> d) & 1 for d in range(D)], axis=-1)
    sel = jnp.asarray(corner_off, jnp.float32)
    outs = []
    ci = 0
    for level in range(spec.num_levels):
        scale = spec.level_scale(level)
        pos = x01 * scale + 0.5
        base = jnp.floor(pos)
        frac = pos - base
        base_i = base.astype(jnp.int32)
        w = jnp.prod(sel[None] * frac[:, None, :]
                     + (1 - sel[None]) * (1 - frac[:, None, :]), axis=-1)
        if spec.is_cell_level(level):
            h = jnp.zeros((N,), jnp.int32)
            for dd in range(D):
                h = h ^ (base_i[:, dd] * hg._i32(hg._PRIMES[dd]))
            h = (h & jnp.int32(spec.cell_rows_per_level - 1)) + jnp.int32(
                ci * spec.cell_rows_per_level)
            vals = jnp.take(cell_table, h, axis=0).reshape(N, 2**D, C)
            outs.append(jnp.sum(vals * w[..., None], axis=1))
            ci += 1
        else:
            corners = base_i[:, None, :] + jnp.asarray(corner_off)
            rows = hg._corner_rows(corners, spec, level) + jnp.int32(
                spec.offsets[level])
            vals = jnp.take(table, rows, axis=0)
            outs.append(jnp.sum(vals * w[..., None], axis=1))
    return jnp.concatenate(outs, axis=-1)


def test_cell_mode_matches_plain_reference():
    spec = _spec(2)
    k = jax.random.PRNGKey(0)
    table = init_hash_table(k, spec) * 1e4  # scale up for visible values
    cell = init_cell_table(jax.random.fold_in(k, 1), spec) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(2), (65, 3))
    got = np.asarray(hash_encode(table, x, spec, cell_table=cell))
    want = np.asarray(plain_cell_encode(table, cell, x, spec))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cell_mode_gradients_match_plain_autodiff():
    spec = _spec(2)
    k = jax.random.PRNGKey(3)
    table = init_hash_table(k, spec)
    cell = init_cell_table(jax.random.fold_in(k, 1), spec)
    x = jax.random.uniform(jax.random.PRNGKey(4), (48, 3))

    g1 = jax.grad(
        lambda t, c: jnp.sum(hash_encode(t, x, spec, cell_table=c) ** 2),
        argnums=(0, 1),
    )(table, cell)
    g2 = jax.grad(
        lambda t, c: jnp.sum(plain_cell_encode(t, c, x, spec) ** 2),
        argnums=(0, 1),
    )(table, cell)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-6)
    assert float(jnp.sum(jnp.abs(g1[1]))) > 0  # cell table actually trains


def test_hash_model_with_cell_levels_trains():
    spec = ModelSpec(model_type="hash", hash_num_levels=6,
                     hash_desired_res=64, hash_log2_size=9,
                     hash_cell_levels=2)
    params = init_field(jax.random.PRNGKey(0), spec)
    assert "encoder_cell" in params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (33, 3)).astype(np.float32))
    d = jnp.asarray((lambda v: v / np.linalg.norm(v, axis=-1, keepdims=True))(
        rng.normal(size=(33, 3)).astype(np.float32)))
    out = field_forward(params, spec, x, d, AABB)
    assert np.isfinite(np.asarray(out.rgb)).all()
    g = jax.grad(
        lambda p: jnp.sum(field_forward(p, spec, x, d, AABB).rgb)
    )(params)
    assert float(jnp.sum(jnp.abs(g["encoder_cell"]))) > 0
