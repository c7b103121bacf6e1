"""Unit tests for the pure-jnp kernel equivalents (SURVEY.md §4 test plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pvd_tpu.ops import (
    trunc_exp,
    near_far_from_aabb,
    morton3d,
    morton3d_invert,
    sh_encode,
    freq_encode,
    freq_output_dim,
)
from pvd_tpu.ops.aabb import FLT_MAX


class TestTruncExp:
    def test_forward_exact(self):
        x = jnp.array([-30.0, -1.0, 0.0, 2.0, 20.0])
        np.testing.assert_allclose(trunc_exp(x), np.exp(np.asarray(x)), rtol=1e-6)

    def test_gradient_truncated(self):
        g = jax.grad(lambda x: trunc_exp(x).sum())
        # inside the clamp range: d/dx exp(x) = exp(x)
        np.testing.assert_allclose(g(jnp.array([1.5])), np.exp(1.5), rtol=1e-6)
        # outside: gradient saturates at exp(+-12)
        np.testing.assert_allclose(g(jnp.array([50.0])), np.exp(12.0), rtol=1e-6)
        np.testing.assert_allclose(g(jnp.array([-50.0])), np.exp(-12.0), rtol=1e-6)


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 1024, size=(1000, 3))
        codes = morton3d(jnp.asarray(coords))
        back = morton3d_invert(codes)
        np.testing.assert_array_equal(np.asarray(back), coords)

    def test_known_values(self):
        def py_morton(x, y, z):
            out = 0
            for b in range(10):
                out |= ((x >> b) & 1) << (3 * b)
                out |= ((y >> b) & 1) << (3 * b + 1)
                out |= ((z >> b) & 1) << (3 * b + 2)
            return out

        rng = np.random.default_rng(1)
        pts = rng.integers(0, 1024, size=(64, 3))
        expect = np.array([py_morton(*p) for p in pts], np.uint32)
        got = np.asarray(morton3d(jnp.asarray(pts)))
        np.testing.assert_array_equal(got, expect)

    def test_ordering_is_xyz_interleave(self):
        # x occupies bit 0, y bit 1, z bit 2 (raymarching.cu __morton3D)
        assert int(morton3d(jnp.array([[1, 0, 0]]))[0]) == 1
        assert int(morton3d(jnp.array([[0, 1, 0]]))[0]) == 2
        assert int(morton3d(jnp.array([[0, 0, 1]]))[0]) == 4


class TestAABB:
    def test_hit_center(self):
        aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
        o = jnp.array([[0.0, 0, -3]])
        d = jnp.array([[0.0, 0, 1]])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(near[0], 2.0, rtol=1e-6)
        np.testing.assert_allclose(far[0], 4.0, rtol=1e-6)

    def test_miss(self):
        aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
        o = jnp.array([[0.0, 5, -3]])
        d = jnp.array([[0.0, 0, 1]])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        assert near[0] == FLT_MAX and far[0] == FLT_MAX

    def test_min_near_floor(self):
        aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
        o = jnp.array([[0.0, 0, 0]])  # inside the box
        d = jnp.array([[0.0, 0, 1]])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(near[0], 0.2, rtol=1e-6)
        np.testing.assert_allclose(far[0], 1.0, rtol=1e-6)

    def test_axis_parallel_rays(self):
        aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
        o = jnp.array([[0.5, 0.5, -3.0], [2.5, 0.5, -3.0]])
        d = jnp.array([[0.0, 0, 1], [0.0, 0, 1]])
        near, far = near_far_from_aabb(o, d, aabb)
        assert np.isfinite(near[0]) and far[0] > near[0]
        assert near[1] == FLT_MAX  # parallel but outside slab


class TestSH:
    @pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_orthonormality(self, degree):
        """Real SH are orthonormal over the sphere: 4π·E[Y_i Y_j] = δ_ij."""
        rng = np.random.default_rng(degree)
        v = rng.normal(size=(60_000, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        Y = np.asarray(sh_encode(jnp.asarray(v), degree))
        gram = 4.0 * np.pi * (Y.T @ Y) / len(v)
        np.testing.assert_allclose(gram, np.eye(degree**2), atol=0.12)

    def test_sign_convention(self):
        """instant-ngp convention: Y_1^{-1} = -c*y, Y_1^0 = +c*z, Y_1^1 = -c*x."""
        d = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        Y = np.asarray(sh_encode(d, 2))
        c = 0.48860251190291992
        np.testing.assert_allclose(Y[0, 3], -c, rtol=1e-6)  # x
        np.testing.assert_allclose(Y[1, 1], -c, rtol=1e-6)  # y
        np.testing.assert_allclose(Y[2, 2], c, rtol=1e-6)  # z
        np.testing.assert_allclose(Y[:, 0], 0.28209479177387814, rtol=1e-6)

    def test_degree4_values(self):
        d = np.array([[0.3, -0.5, 0.4]], np.float32)
        d /= np.linalg.norm(d)
        x, y, z = d[0]
        Y = np.asarray(sh_encode(jnp.asarray(d), 4))[0]
        np.testing.assert_allclose(Y[4], 1.0925484305920792 * x * y, rtol=1e-5)
        np.testing.assert_allclose(
            Y[6], 0.94617469575755997 * z * z - 0.31539156525251999, rtol=1e-5
        )
        np.testing.assert_allclose(
            Y[12], 0.3731763325901154 * z * (5 * z * z - 3), rtol=1e-5
        )

    def test_autodiff_works(self):
        g = jax.jacobian(lambda d: sh_encode(d, 4))(jnp.array([0.6, 0.0, 0.8]))
        assert np.all(np.isfinite(np.asarray(g)))


class TestFreq:
    def test_layout_and_values(self):
        x = jnp.array([[0.25, -0.5, 1.0]])
        n_freqs = 4
        out = np.asarray(freq_encode(x, n_freqs))
        assert out.shape == (1, freq_output_dim(3, n_freqs))
        np.testing.assert_allclose(out[0, :3], np.asarray(x)[0])
        xa = np.asarray(x)[0]
        # band 0: sin(x), cos(x); band k: sin(2^k x), cos(2^k x)
        for k in range(n_freqs):
            base = 3 + k * 6
            np.testing.assert_allclose(
                out[0, base : base + 3], np.sin(xa * 2.0**k), rtol=1e-6
            )
            np.testing.assert_allclose(
                out[0, base + 3 : base + 6], np.cos(xa * 2.0**k), rtol=1e-6
            )


class TestPerceptualProxy:
    """lpips_proxy: the random-conv perceptual fallback (NOT reference
    LPIPS — reported only when pretrained alex/vgg weights are absent)."""

    def test_zero_for_identical_and_orders_degradations(self):
        from pvd_tpu.utils.metrics import lpips_proxy

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        assert lpips_proxy(img, img) == 0.0
        # mild blur should be perceptually closer than heavy noise
        blur = img.copy()
        blur[1:] = 0.5 * (blur[1:] + blur[:-1])
        noisy = np.clip(
            img + rng.normal(0, 0.5, img.shape).astype(np.float32), 0, 1)
        d_blur = lpips_proxy(blur, img)
        d_noise = lpips_proxy(noisy, img)
        assert 0.0 < d_blur < d_noise
        # deterministic across calls (fixed-seed filters)
        assert lpips_proxy(noisy, img) == d_noise
