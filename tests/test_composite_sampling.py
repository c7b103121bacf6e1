"""Compositing semantics vs a per-ray python oracle, and sampler checks."""

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.ops.composite import composite_rays, composite_stratified
from pvd_tpu.ops.sampling import sample_pdf, stratified_z_vals


def oracle_composite(sigmas, rgbs, delta_t, delta_depth, mask, early_stop=False):
    """Sequential transcription of composite semantics (one ray at a time):
    alpha blending with cumulative-real-delta depth, optional T<1e-4 stop."""
    N, S = sigmas.shape
    ws = np.zeros(N)
    depth = np.zeros(N)
    image = np.zeros((N, 3))
    for n in range(N):
        T = 1.0
        t_cum = 0.0
        for s in range(S):
            if not mask[n, s]:
                continue
            if early_stop and T < 1e-4:
                break
            alpha = 1.0 - np.exp(-sigmas[n, s] * delta_t[n, s])
            w = alpha * T
            t_cum += delta_depth[n, s]
            ws[n] += w
            depth[n] += w * t_cum
            image[n] += w * rgbs[n, s]
            T *= 1.0 - alpha
    return ws, depth, image


def _random_batch(seed, N=16, S=24):
    rng = np.random.default_rng(seed)
    sigmas = rng.uniform(0, 30, (N, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
    delta_t = rng.uniform(0.001, 0.02, (N, S)).astype(np.float32)
    delta_depth = rng.uniform(0.001, 0.2, (N, S)).astype(np.float32)
    mask = rng.uniform(size=(N, S)) < 0.7
    # masked samples must not advance depth: zero their deltas like the
    # padded renderer does
    delta_depth = delta_depth * mask
    return sigmas, rgbs, delta_t, delta_depth, mask


def test_composite_matches_oracle():
    sigmas, rgbs, delta_t, delta_depth, mask = _random_batch(0)
    ws, depth, image, _ = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(delta_t),
        jnp.asarray(delta_depth), jnp.asarray(mask)
    )
    ws_o, d_o, im_o = oracle_composite(sigmas, rgbs, delta_t, delta_depth, mask)
    np.testing.assert_allclose(np.asarray(ws), ws_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), d_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(image), im_o, atol=1e-5)


def test_composite_early_stop_matches_oracle():
    sigmas, rgbs, delta_t, delta_depth, mask = _random_batch(1)
    sigmas = sigmas * 20  # force early saturation
    ws, depth, image, _ = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(delta_t),
        jnp.asarray(delta_depth), jnp.asarray(mask), early_stop=True
    )
    ws_o, d_o, im_o = oracle_composite(
        sigmas, rgbs, delta_t, delta_depth, mask, early_stop=True
    )
    np.testing.assert_allclose(np.asarray(ws), ws_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(image), im_o, atol=1e-4)


def test_composite_gradients_match_finite_differences():
    sigmas, rgbs, delta_t, delta_depth, mask = _random_batch(2, N=3, S=6)
    sigmas = sigmas / 10

    def loss(s):
        ws, depth, image, _ = composite_rays(
            s, jnp.asarray(rgbs), jnp.asarray(delta_t),
            jnp.asarray(delta_depth), jnp.asarray(mask)
        )
        return jnp.sum(image**2) + jnp.sum(ws) + 0.3 * jnp.sum(depth)

    g = np.asarray(jax.grad(loss)(jnp.asarray(sigmas)))
    eps = 1e-3
    for (n, s) in [(0, 0), (1, 3), (2, 5)]:
        sp = sigmas.copy()
        sp[n, s] += eps
        sm = sigmas.copy()
        sm[n, s] -= eps
        fd = (loss(jnp.asarray(sp)) - loss(jnp.asarray(sm))) / (2 * eps)
        np.testing.assert_allclose(g[n, s], fd, rtol=2e-2, atol=1e-4)


def test_fully_opaque_ray_sums_to_one():
    N, S = 4, 32
    sigmas = jnp.full((N, S), 1e3)
    rgbs = jnp.full((N, S, 3), 0.5)
    delta = jnp.full((N, S), 0.01)
    mask = jnp.ones((N, S), bool)
    ws, _, image, _ = composite_rays(sigmas, rgbs, delta, delta, mask)
    np.testing.assert_allclose(np.asarray(ws), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(image), 0.5, atol=1e-5)


def test_stratified_z_vals_cover_range():
    nears = jnp.array([2.0, 1.0])
    fars = jnp.array([4.0, 5.0])
    z, sd = stratified_z_vals(jax.random.PRNGKey(0), nears, fars, 64, perturb=False)
    assert z.shape == (2, 64)
    np.testing.assert_allclose(np.asarray(z[:, 0]), [2.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[:, -1]), [4.0, 5.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd[:, 0]), [2 / 64, 4 / 64], atol=1e-6)


def test_sample_pdf_concentrates_on_heavy_bins():
    # weights peaked in the middle bins -> samples should cluster there
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 17)[None], (2, 17))
    w = np.full((2, 16), 1e-3, np.float32)
    w[:, 7:9] = 10.0
    samples = sample_pdf(jax.random.PRNGKey(0), bins, jnp.asarray(w), 256, det=True)
    s = np.asarray(samples)
    frac_in_peak = np.mean((s > 7 / 16) & (s < 9 / 16))
    assert frac_in_peak > 0.9
    assert s.shape == (2, 256)
    assert np.all(np.diff(s, axis=-1) >= -1e-6)  # det samples are sorted


def test_composite_stratified_white_background_behavior():
    # zero density -> weights_sum 0 -> image 0 (bg added by the renderer)
    N, T = 3, 16
    sigmas = jnp.zeros((N, T))
    z, sd = stratified_z_vals(
        jax.random.PRNGKey(1), jnp.ones(N), jnp.full(N, 3.0), T, perturb=False
    )
    rgbs = jnp.full((N, T, 3), 0.7)
    ws, weights, image = composite_stratified(sigmas, z, sd, rgbs)
    np.testing.assert_allclose(np.asarray(ws), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(image), 0.0, atol=1e-6)
