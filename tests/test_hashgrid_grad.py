"""The scatter-splitting custom VJP must equal plain autodiff gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.ops import HashGridSpec, hash_encode


def plain_encode(table, x01, spec):
    """Reference gradient path: same math, default autodiff (no custom vjp,
    no packing)."""
    from pvd_tpu.ops.hashgrid import _corner_rows, _level_corner_plan

    D, C = spec.input_dim, spec.level_dim
    N = x01.shape[0]
    offsets = spec.offsets
    corner_bits = np.arange(2**D, dtype=np.int32)
    corner_off = np.stack([(corner_bits >> d) & 1 for d in range(D)], axis=-1)
    sel = jnp.asarray(corner_off, jnp.float32)
    outs = []
    for level in range(spec.num_levels):
        scale = spec.level_scale(level)
        pos = x01 * scale + 0.5
        base = jnp.floor(pos)
        frac = pos - base
        base_i = base.astype(jnp.int32)
        corners = base_i[:, None, :] + jnp.asarray(corner_off)
        rows = _corner_rows(corners, spec, level) + jnp.int32(offsets[level])
        w = jnp.prod(
            sel[None] * frac[:, None, :]
            + (1 - sel[None]) * (1 - frac[:, None, :]), axis=-1)
        vals = jnp.take(table, rows, axis=0)
        outs.append(jnp.sum(vals * w[..., None], axis=1))
    return jnp.concatenate(outs, axis=-1)


def test_custom_vjp_matches_plain_autodiff():
    spec = HashGridSpec(
        num_levels=5, base_resolution=4, desired_resolution=48,
        log2_hashmap_size=8,
    )
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(spec.table_size, spec.level_dim)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, size=(96, 3)).astype(np.float32))
    g_target = jnp.asarray(
        rng.normal(size=(96, spec.output_dim)).astype(np.float32))

    def loss_custom(tab):
        return jnp.sum(hash_encode(tab, x, spec, packed_dense=False) * g_target)

    def loss_plain(tab):
        return jnp.sum(plain_encode(tab, x, spec) * g_target)

    # forward parity first
    np.testing.assert_allclose(
        np.asarray(hash_encode(table, x, spec, packed_dense=False)),
        np.asarray(plain_encode(table, x, spec)), atol=2e-5)

    g1 = np.asarray(jax.grad(loss_custom)(table))
    g2 = np.asarray(jax.grad(loss_plain)(table))
    np.testing.assert_allclose(g1, g2, atol=3e-5)


def test_custom_vjp_split_path():
    """Level larger than the scatter chunk exercises the split branch."""
    import pvd_tpu.ops.hashgrid as hg

    old = hg._SCATTER_CHUNK
    hg._SCATTER_CHUNK = 64  # force splitting on a small table
    try:
        spec = HashGridSpec(num_levels=3, base_resolution=4,
                            desired_resolution=32, log2_hashmap_size=7)
        rng = np.random.default_rng(1)
        table = jnp.asarray(
            rng.normal(size=(spec.table_size, spec.level_dim)).astype(np.float32))
        x = jnp.asarray(rng.uniform(0, 1, size=(64, 3)).astype(np.float32))

        def loss(tab, packed):
            return jnp.sum(hash_encode(tab, x, spec, packed_dense=packed) ** 2)

        g_split = np.asarray(jax.grad(lambda t: loss(t, False))(table))
    finally:
        hg._SCATTER_CHUNK = old
    g_ref = np.asarray(jax.grad(lambda t: loss(t, False))(table))
    np.testing.assert_allclose(g_split, g_ref, atol=3e-5)
