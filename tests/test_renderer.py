"""Renderer tests: marching vs a sequential DDA oracle, compositing paths."""

import dataclasses
import math
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec, RenderSpec
from pvd_tpu.models import init_field
from pvd_tpu.ops.aabb import near_far_from_aabb
from pvd_tpu.render.occupancy import set_bitfield
from pvd_tpu.render import (
    init_occupancy_state,
    march_rays,
    render_rays,
    render_stratified,
)
from pvd_tpu.render.renderer import sample_positions

SQRT3 = math.sqrt(3.0)


def oracle_march(o, d, near, far, bitfield3d, H, bound, max_steps, s_max):
    """Sequential transcription of occupancy-DDA semantics for one ray
    (dt_gamma=0): evaluate every lattice point, keep occupied ones."""
    dt = 2 * SQRT3 / max_steps
    ts = []
    t = near
    while t < far and len(ts) < s_max:
        p = np.clip(o + t * d, -bound, bound)
        n = np.clip((0.5 * (p / min(1.0, bound) + 1) * H).astype(int), 0, H - 1)
        if bitfield3d[n[0], n[1], n[2]]:
            ts.append(t)
        t += dt
        if (t - near) / dt > max_steps:
            break
    return np.array(ts)


def _spec(grid=32, steps=128, s_max=32):
    return RenderSpec(
        bound=1.0, grid_size=grid, max_steps=steps, max_samples=s_max,
        density_thresh=0.01,
    )


def test_march_matches_oracle_full_grid():
    rspec = _spec()
    H = rspec.grid_size
    rng = np.random.default_rng(0)
    # random occupancy (~30%)
    bf3 = rng.uniform(size=(H, H, H)) < 0.3
    bitfield = jnp.asarray(bf3.reshape(-1))

    N = 24
    o = rng.uniform(-0.2, 0.2, (N, 3)).astype(np.float32)
    o[:, 2] = -2.5
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
    samples = march_rays(bitfield, jnp.asarray(o), jnp.asarray(d),
                         nears, fars, rspec)

    t_np = np.asarray(samples.t)
    m_np = np.asarray(samples.mask)
    for n in range(N):
        want = oracle_march(
            o[n], d[n], float(nears[n]), float(fars[n]), bf3, H,
            rspec.bound, rspec.max_steps, rspec.max_samples,
        )
        got = t_np[n][m_np[n]]
        assert len(got) == len(want), f"ray {n}: {len(got)} vs {len(want)}"
        np.testing.assert_allclose(got, want, atol=1e-5)


def oracle_march_dda_gamma(o, d, near, far, bitfield3d, H, bound, max_steps,
                           dt_gamma, s_max):
    """Behavioral transcription of the reference DDA for dt_gamma > 0
    (raymarching.cu:362-403): the skip branch advances t by the SAME
    clamp(t*dt_gamma, dt_min, dt_max) recurrence as the emit branch
    (`do { t += clamp(...) } while (t < tt)`, cu:399-402), so the whole
    t-trajectory is occupancy-independent and samples are exactly the
    trajectory points whose cell is occupied.  f32 arithmetic like CUDA."""
    f32 = np.float32
    dt_min = f32(2 * SQRT3 / max_steps)
    dt_max = f32(2 * SQRT3 / H)  # single cascade
    ts, dts = [], []
    t = f32(near)
    steps = 0
    while t < far and steps < max_steps and len(ts) < s_max:
        p = np.clip(o + t * d, -bound, bound)
        n = np.clip((0.5 * (p / min(1.0, bound) + 1) * H).astype(int),
                    0, H - 1)
        dt = f32(np.clip(t * f32(dt_gamma), dt_min, dt_max))
        if bitfield3d[n[0], n[1], n[2]]:
            ts.append(float(t))
            dts.append(float(dt))
        t = f32(t + dt)
        steps += 1
    return np.array(ts), np.array(dts)


def test_march_dt_gamma_matches_reference_dda():
    """dt_gamma > 0 oracle (VERDICT #7): the lattice+mask march must emit
    exactly the reference DDA's (t, dt) sample sequence."""
    rspec = RenderSpec(bound=1.0, grid_size=32, max_steps=256,
                       max_samples=64, density_thresh=0.01, dt_gamma=1 / 128)
    assert not rspec.use_coarse_march  # dt_gamma forces the plain lattice
    H = rspec.grid_size
    rng = np.random.default_rng(11)
    bf3 = rng.uniform(size=(H, H, H)) < 0.3
    bitfield = jnp.asarray(bf3.reshape(-1))

    n_rays = 24
    o = rng.uniform(-0.2, 0.2, (n_rays, 3)).astype(np.float32)
    o[:, 2] = -2.5
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(oj, dj, aabb)

    samples = march_rays(bitfield, oj, dj, nears, fars, rspec)
    t_ours = np.asarray(samples.t)
    dt_ours = np.asarray(samples.dt)
    mask = np.asarray(samples.mask)

    checked = 0
    for i in range(n_rays):
        t_ref, dt_ref = oracle_march_dda_gamma(
            o[i], d[i], float(nears[i]), float(fars[i]), bf3, H, 1.0,
            rspec.max_steps, rspec.dt_gamma, rspec.max_samples)
        k = mask[i].sum()
        assert k == len(t_ref), (i, k, len(t_ref))
        if k:
            np.testing.assert_allclose(t_ours[i, :k], t_ref, rtol=2e-5,
                                       atol=2e-5)
            np.testing.assert_allclose(dt_ours[i, :k], dt_ref, rtol=2e-5,
                                       atol=2e-5)
            checked += 1
    assert checked >= 8  # enough rays actually hit occupancy


def test_march_empty_grid_gives_no_samples():
    rspec = _spec()
    H = rspec.grid_size
    bitfield = jnp.zeros((H * H * H,), bool)
    o = jnp.array([[0.0, 0, -2.0]])
    d = jnp.array([[0.0, 0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, jnp.array([-1.0, -1, -1, 1, 1, 1]))
    s = march_rays(bitfield, o, d, nears, fars, rspec)
    assert not bool(jnp.any(s.mask))


def test_march_missed_ray_gives_no_samples():
    rspec = _spec()
    H = rspec.grid_size
    bitfield = jnp.ones((H * H * H,), bool)
    o = jnp.array([[0.0, 5.0, -2.0]])  # misses the box
    d = jnp.array([[0.0, 0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, jnp.array([-1.0, -1, -1, 1, 1, 1]))
    s = march_rays(bitfield, o, d, nears, fars, rspec)
    assert not bool(jnp.any(s.mask))


def test_delta_depth_accumulates_to_travel_distance():
    rspec = _spec()
    H = rspec.grid_size
    bitfield = jnp.ones((H * H * H,), bool)  # fully occupied
    o = jnp.array([[0.0, 0, -2.0]])
    d = jnp.array([[0.0, 0, 1.0]])
    nears, fars = near_far_from_aabb(o, d, jnp.array([-1.0, -1, -1, 1, 1, 1]))
    s = march_rays(bitfield, o, d, nears, fars, rspec)
    # cumulative delta_depth at sample i == t_i + dt_i - t0
    cum = np.cumsum(np.asarray(s.delta_depth[0]))
    m = np.asarray(s.mask[0])
    t = np.asarray(s.t[0])
    dt = np.asarray(s.dt[0])
    np.testing.assert_allclose(
        cum[m], (t + dt - float(s.t0[0]))[m], atol=1e-5
    )


def _tiny_model():
    spec = ModelSpec(model_type="hash", hash_num_levels=4, hash_desired_res=64)
    params = init_field(jax.random.PRNGKey(0), spec)
    return spec, params


def test_render_rays_shapes_and_bg():
    spec, params = _tiny_model()
    rspec = _spec()
    occ = init_occupancy_state(rspec)
    # everything occupied so rays do get samples
    occ = set_bitfield(occ, jnp.ones_like(occ.bitfield))
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-0.1, 0.1, (8, 3)).astype(np.float32) +
                    np.array([0, 0, -2.0], np.float32))
    d = jnp.asarray(np.tile(np.array([0, 0, 1.0], np.float32), (8, 1)))

    out = jax.jit(
        lambda p, o_, d_: render_rays(
            p, spec, rspec, occ, o_, d_, training=True, bg_color=1.0
        )
    )(params, o, d)
    assert out["image"].shape == (8, 3)
    assert out["depth"].shape == (8,)
    img = np.asarray(out["image"])
    assert np.all(np.isfinite(img))
    # fresh random net has tiny sigma -> mostly background (white)
    ws = np.asarray(out["weights_sum"])
    np.testing.assert_allclose(img, 1.0 - ws[:, None] * (1 - img), atol=1.0)


def test_render_rays_inherited_samples_align():
    """Teacher replaying student samples sees identical sample positions."""
    spec, params = _tiny_model()
    spec2 = ModelSpec(model_type="mlp", nerf_layer_num=4, nerf_layer_wide=32,
                      pe_multires=4, skip=1)
    params2 = init_field(jax.random.PRNGKey(3), spec2)
    rspec = _spec()
    occ = init_occupancy_state(rspec)
    occ = set_bitfield(occ, jnp.ones_like(occ.bitfield))
    o = jnp.array([[0.0, 0, -2.0], [0.1, 0, -2.0]])
    d = jnp.array([[0.0, 0, 1.0], [0.0, 0, 1.0]])

    out_stu = render_rays(params, spec, rspec, occ, o, d, training=True)
    out_tea = render_rays(
        params2, spec2, rspec, occ, o, d, training=True,
        inherited=out_stu["samples"],
    )
    np.testing.assert_array_equal(
        np.asarray(out_stu["samples"].t), np.asarray(out_tea["samples"].t)
    )
    assert out_stu["fea_sc"].shape == out_tea["fea_sc"].shape
    assert out_stu["sigma_logit"].shape == out_tea["sigma_logit"].shape


def test_render_stratified_runs_and_matches_grid_path_roughly():
    """With a fully-occupied grid and a dense lattice the two paths see the
    same field; images should agree to a few 1e-2 (different sampling)."""
    spec, params = _tiny_model()
    rspec = RenderSpec(bound=1.0, grid_size=32, max_steps=256, max_samples=256,
                       num_steps=256)
    occ = init_occupancy_state(rspec)
    occ = set_bitfield(occ, jnp.ones_like(occ.bitfield))
    o = jnp.array([[0.0, 0, -2.0], [0.05, 0.05, -2.0]])
    d = jnp.array([[0.0, 0, 1.0], [0.0, 0, 1.0]])

    out_g = render_rays(params, spec, rspec, occ, o, d, training=False)
    out_s = render_stratified(params, spec, rspec, occ.aabb_infer, o, d)
    np.testing.assert_allclose(
        np.asarray(out_g["image"]), np.asarray(out_s["image"]), atol=0.05
    )


def test_stage_gated_outputs():
    spec, params = _tiny_model()
    rspec = _spec()
    occ = init_occupancy_state(rspec)
    occ = set_bitfield(occ, jnp.ones_like(occ.bitfield))
    o = jnp.array([[0.0, 0, -2.0]])
    d = jnp.array([[0.0, 0, 1.0]])
    # stage 1: features only
    out1 = render_rays(params, spec, rspec, occ, o, d, training=True,
                       want_color=False)
    assert "image" not in out1 and out1["rgb_l"] is None
    assert out1["fea_sc"] is not None
    # stage 2: point colors, no image
    out2 = render_rays(params, spec, rspec, occ, o, d, training=True,
                       composite=False)
    assert "image" not in out2 and out2["rgb_l"] is not None


def test_coarse_march_equals_full_march():
    """The dilated two-stage march must produce exactly the same samples as
    the full-lattice march (the dilation makes the coarse test conservative)."""
    rspec = RenderSpec(bound=1.0, grid_size=32, max_steps=256, max_samples=32,
                       density_thresh=0.01, coarse_march=True, coarse_stride=8)
    H = rspec.grid_size
    rng = np.random.default_rng(7)
    bf = jnp.asarray((rng.uniform(size=(H * H * H,)) < 0.05))
    occ = set_bitfield(init_occupancy_state(rspec), bf)

    N = 64
    o = rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32)
    o[:, 2] = -2.5
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)

    full = march_rays(bf, jnp.asarray(o), jnp.asarray(d), nears, fars, rspec)
    coarse = march_rays(bf, jnp.asarray(o), jnp.asarray(d), nears, fars,
                        rspec, bitfield_dilated=occ.bitfield_dilated)
    np.testing.assert_array_equal(np.asarray(full.mask), np.asarray(coarse.mask))
    np.testing.assert_allclose(np.asarray(full.t), np.asarray(coarse.t),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.delta_depth),
                               np.asarray(coarse.delta_depth), atol=1e-6)


def test_dilate_bitfield_is_cube_maxpool():
    from pvd_tpu.render.occupancy import dilate_bitfield

    H = 8
    bf = np.zeros((H, H, H), bool)
    bf[4, 2, 6] = True
    out = np.asarray(dilate_bitfield(jnp.asarray(bf.reshape(-1)), H)).reshape(
        H, H, H)
    want = np.zeros_like(bf)
    want[2:7, 0:5, 4:9 if 9 < H else H] = True
    want[2:7, 0:5, 4:H] = True
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("model_type", ["hash", "mlp", "vm", "tensors"])
def test_background_model_renders(model_type):
    """bg_radius > 0 routes the background through the learned sphere model
    for EVERY architecture (reference builds the bg net for any model_type,
    network.py:154-182 — including tensors)."""
    spec = ModelSpec(model_type=model_type, hash_num_levels=4,
                     hash_desired_res=64, vm_resolution=(32, 32, 32),
                     plenoxel_res=(24, 24, 24), nerf_layer_num=2,
                     nerf_layer_wide=32, bg_radius=32.0)
    params = init_field(jax.random.PRNGKey(11), spec)
    assert "bg" in params
    rspec = _spec()
    occ = set_bitfield(init_occupancy_state(rspec),
                       jnp.ones((rspec.grid_size**3,), bool))
    o = jnp.array([[0.0, 0, -2.0], [0.3, 0.1, -2.0]])
    d = jnp.array([[0.0, 0, 1.0], [0.0, 0, 1.0]])
    out = render_rays(params, spec, rspec, occ, o, d, training=True,
                      perturb_key=jax.random.PRNGKey(1))
    img = np.asarray(out["image"])
    assert np.all(np.isfinite(img)) and img.shape == (2, 3)
    # gradients reach the background net
    def loss(p):
        o_ = render_rays(p, spec, rspec, occ, o, d, training=True)
        return jnp.sum(o_["image"])
    g = jax.grad(loss)(params)
    total_bg = sum(float(jnp.sum(jnp.abs(l)))
                   for l in jax.tree_util.tree_leaves(g["bg"]))
    assert np.isfinite(total_bg)


def oracle_march_dda_mip(o, d, near, far, bitfield, H, C, bound, max_steps,
                         dt_gamma, s_max):
    """Reference DDA transcription WITH the cascade/mip selection
    (raymarching.cu:44-56, 362-403): mip = max(exponent(|pos|_inf),
    exponent(dt*H/2)) clipped to C-1; the cell is taken in that cascade's
    frame.  f32 arithmetic like CUDA."""
    f32 = np.float32
    bf = bitfield.reshape(C, H, H, H)
    dt_min = f32(2 * SQRT3 / max_steps)
    dt_max = f32(2 * SQRT3 * (2 ** (C - 1)) / H)
    ts, dts = [], []
    t = f32(near)
    steps = 0
    while t < far and steps < max_steps and len(ts) < s_max:
        p = np.clip(o + t * d, -bound, bound)
        dt = f32(np.clip(t * f32(dt_gamma), dt_min, dt_max))
        mx = np.max(np.abs(p))
        lvl_pos = np.clip(np.frexp(mx)[1], 0, C - 1)
        lvl_dt = np.clip(np.frexp(dt * H * 0.5)[1], 0, C - 1)
        lvl = max(int(lvl_pos), int(lvl_dt))
        mb = min(2.0 ** lvl, bound)
        n = np.clip((0.5 * (p / mb + 1) * H).astype(int), 0, H - 1)
        if bf[lvl, n[0], n[1], n[2]]:
            ts.append(float(t))
            dts.append(float(dt))
        t = f32(t + dt)
        steps += 1
    return np.array(ts), np.array(dts)


def _c2_setup(seed=13, n_rays=24, occ_frac=0.25):
    rspec = RenderSpec(bound=2.0, grid_size=32, max_steps=256,
                       max_samples=64, density_thresh=0.01,
                       dt_gamma=1 / 256)
    H, C = rspec.grid_size, rspec.cascades
    assert C == 2
    rng = np.random.default_rng(seed)
    bf = rng.uniform(size=(C * H * H * H,)) < occ_frac
    o = rng.uniform(-0.2, 0.2, (n_rays, 3)).astype(np.float32)
    o[:, 2] = -3.5
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.array([-2.0, -2, -2, 2, 2, 2])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
    return rspec, H, C, bf, o, d, nears, fars


def test_march_c2_dt_gamma_matches_reference_dda():
    """VERDICT r2 #4: the DDA oracle holds for C>1 (multi-cascade mip
    selection) on the direct lattice path."""
    rspec, H, C, bf, o, d, nears, fars = _c2_setup()
    samples = march_rays(jnp.asarray(bf), jnp.asarray(o), jnp.asarray(d),
                         nears, fars, rspec)
    t_ours = np.asarray(samples.t)
    mask = np.asarray(samples.mask)
    checked = 0
    for i in range(len(o)):
        t_ref, dt_ref = oracle_march_dda_mip(
            o[i], d[i], float(nears[i]), float(fars[i]), bf, H, C,
            rspec.bound, rspec.max_steps, rspec.dt_gamma, rspec.max_samples)
        k = mask[i].sum()
        assert k == len(t_ref), (i, k, len(t_ref))
        if k:
            np.testing.assert_allclose(t_ours[i, :k], t_ref, rtol=2e-5,
                                       atol=2e-5)
            checked += 1
    assert checked >= 8


def test_probe_mc_march_is_conservative_superset():
    """The multi-cascade probe march (5^3 per-cascade masks + exact
    cross-mip overrides) must keep every sample the exact march keeps —
    and since round 4 it is EXACT up to the per-ray override budget, so
    extras must be zero on any realistic grid."""
    from pvd_tpu.render.occupancy import build_neighbor_masks_mc
    from pvd_tpu.render.renderer import _probe_march_occ_mc, _t_lattice

    rspec, H, C, bf, o, d, nears, fars = _c2_setup(occ_frac=0.15)
    bitfield = jnp.asarray(bf)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t0 = nears
    ts, dts = _t_lattice(t0, rspec)

    # exact per-lattice-point occupancy (direct lookup)
    from pvd_tpu.render.renderer import _occupancy_lookup

    pos = oj[:, None, :] + ts[..., None] * dj[:, None, :]
    pos = jnp.clip(pos, -rspec.bound, rspec.bound)
    exact = np.asarray(_occupancy_lookup(bitfield, pos, dts, rspec)
                       & (ts < fars[:, None]))

    masks = build_neighbor_masks_mc(bitfield, H)
    probe_nl, _ = _probe_march_occ_mc(masks, oj, dj, t0, fars, rspec)
    probe = np.asarray(probe_nl)  # [N, L_m] (span-bounded lattice)
    # align: the probe's own lattice may be shorter or slightly longer
    # (W*F rounding) than max_steps; its points past max_steps are dead
    L_m, L = probe.shape[1], exact.shape[1]
    exact_pad = np.zeros((exact.shape[0], max(L_m, L)), bool)
    exact_pad[:, :L] = exact
    probe_pad = np.zeros_like(exact_pad)
    probe_pad[:, :L_m] = probe
    assert not exact_pad[:, L_m:].any()  # span bound really covers far
    # superset: the probe never drops an exact sample
    assert (exact_pad & ~probe_pad).sum() == 0
    # exact up to the cross-mip override budget -> no extras at all here
    extra = (probe_pad & ~exact_pad).sum()
    assert extra == 0, (extra, exact_pad.sum())


def test_probe_mc_extra_rate_on_converged_grid():
    """VERDICT r3 item 7: quantify the MC probe march's conservative
    fallback (renderer.py _probe_march_occ_mc: unresolvable lattice points
    — mip transitions inside a 4-point window, top-mip dt_max overrun —
    are marked occupied-if-any-geometry) on a CONVERGED-like cascaded
    grid: cascade 0 = a clustered object (thick shell + blobs, ~4%
    occupancy), cascade 1 = a sparse far background shell (~2%).  The
    extra samples the fallback admits must stay < 5% of the samples the
    probe march EMITS."""
    from pvd_tpu.render.occupancy import build_neighbor_masks_mc
    from pvd_tpu.render.renderer import (
        _occupancy_lookup,
        _probe_march_occ_mc,
        _t_lattice,
    )

    rspec, H, C, _, o, d, nears, fars = _c2_setup(n_rays=48)
    # converged-like clustered occupancy instead of _c2_setup's uniform one
    ax = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    g0 = (r > 0.42) & (r < 0.55)
    rng = np.random.default_rng(7)
    for _ in range(5):
        c = rng.uniform(-0.3, 0.3, 3)
        g0 |= ((X - c[0]) ** 2 + (Y - c[1]) ** 2
               + (Z - c[2]) ** 2) < rng.uniform(0.08, 0.16) ** 2
    g1 = (r > 0.80) & (r < 0.86)  # far shell in cascade 1's frame
    bf = np.concatenate([g0.reshape(-1), g1.reshape(-1)])

    bitfield = jnp.asarray(bf)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    ts, dts = _t_lattice(nears, rspec)
    pos = oj[:, None, :] + ts[..., None] * dj[:, None, :]
    pos = jnp.clip(pos, -rspec.bound, rspec.bound)
    exact = np.asarray(_occupancy_lookup(bitfield, pos, dts, rspec)
                       & (ts < fars[:, None]))
    masks = build_neighbor_masks_mc(bitfield, H)
    probe_nl, _ = _probe_march_occ_mc(masks, oj, dj, nears, fars, rspec)
    probe = np.asarray(probe_nl)
    L_m, L = probe.shape[1], exact.shape[1]
    exact_pad = np.zeros((exact.shape[0], max(L_m, L)), bool)
    exact_pad[:, :L] = exact
    probe_pad = np.zeros_like(exact_pad)
    probe_pad[:, :L_m] = probe
    exact, probe = exact_pad, probe_pad
    assert (exact & ~probe).sum() == 0  # still a superset
    emitted = probe.sum()
    extra = (probe & ~exact).sum()
    assert emitted > 0
    # round-4 marcher resolves cross-mip points exactly (the <5% bound
    # this test was written for is now met with zero margin)
    assert extra == 0, (extra, emitted)


def test_probe_mc_through_render_rays():
    """render_rays on a C=2/dt_gamma>0 OccupancyState (which now carries
    9^3 masks) must produce finite images; empty grid -> pure bg."""
    from pvd_tpu.render import init_occupancy_state
    from pvd_tpu.render.occupancy import set_bitfield

    rspec, H, C, bf, o, d, nears, fars = _c2_setup()
    rspec = dataclasses.replace(rspec, samples_per_ray=8.0)
    occ = set_bitfield(init_occupancy_state(rspec), jnp.asarray(bf))
    # per-cascade supercell masks + the sentinel row (see occupancy)
    from pvd_tpu.render.occupancy import MC_WORDS, SUPER_G

    assert occ.neighbor_masks.shape == (
        C * (H // SUPER_G) ** 3 + 1, MC_WORDS)
    spec = ModelSpec(model_type="hash", bound=2.0, hash_num_levels=4,
                     hash_desired_res=64)
    params = init_field(jax.random.PRNGKey(0), spec)
    out = render_rays(params, spec, rspec, occ, jnp.asarray(o),
                      jnp.asarray(d), training=False, bg_color=1.0,
                      early_stop=True)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()

    occ0 = set_bitfield(occ, jnp.zeros_like(occ.bitfield))
    out0 = render_rays(params, spec, rspec, occ0, jnp.asarray(o),
                       jnp.asarray(d), training=False, bg_color=1.0,
                       early_stop=True)
    np.testing.assert_allclose(np.asarray(out0["image"]), 1.0, atol=1e-5)


def test_pack_supercells_matches_bruteforce():
    """The strided supercell packer (occupancy._pack_supercells) is
    bit-identical to the brute-force definition at BOTH apron reaches
    (single-cascade D=SUPER_D and multi-cascade D=MC_D): bit
    oz*side*16 + oy*16 + ox of supercell s is g[4*s + (ox,oy,oz) - D]
    (zero outside), incl. leading cascade dims."""
    from pvd_tpu.render.occupancy import MC_D, SUPER_D, SUPER_G, \
        _pack_supercells

    rng = np.random.default_rng(0)
    H = 16
    S = H // SUPER_G
    g = rng.random((2, H, H, H)) < 0.3
    for D in (SUPER_D, MC_D):
        side = SUPER_G + 2 * D
        nw = side * (side // 2)
        out = np.asarray(_pack_supercells(jnp.asarray(g), D=D))
        assert out.shape == (2, S, S, S, nw)
        exp = np.zeros((2, S, S, S, nw), np.uint32)
        gp = np.zeros((2, H + 2 * D, H + 2 * D, H + 2 * D), bool)
        gp[:, D:H + D, D:H + D, D:H + D] = g
        for oz in range(side):
            for oy in range(side):
                for ox in range(side):
                    bit = (oz * side + oy) * 16 + ox
                    v = gp[:,
                           ox:ox + SUPER_G * (S - 1) + 1:SUPER_G,
                           oy:oy + SUPER_G * (S - 1) + 1:SUPER_G,
                           oz:oz + SUPER_G * (S - 1) + 1:SUPER_G]
                    exp[..., bit // 32] |= (
                        v.astype(np.uint32) << np.uint32(bit % 32))
        assert (out == exp).all(), f"supercell packer mismatch at D={D}"


def test_lazy_t_march_matches_eager_through_render_rays():
    """The lazy-t MC-probe march (march_rays(lazy_t=True): lattice_pos +
    ts_flat instead of materialized t/dt/delta_depth [N, S]) must render
    IDENTICALLY to the eager march on the budget-compacted path —
    render_rays gathers t at the M compacted slots from ts_flat, and the
    eager path gathers from the materialized block; both read the same
    _t_lattice values."""
    from pvd_tpu.render.renderer import compact_samples

    rspec, H, C, bf, o, d, nears, fars = _c2_setup()
    rspec = dataclasses.replace(rspec, samples_per_ray=8.0)
    occ = set_bitfield(init_occupancy_state(rspec), jnp.asarray(bf))
    spec = ModelSpec(model_type="hash", bound=2.0, hash_num_levels=4,
                     hash_desired_res=64)
    params = init_field(jax.random.PRNGKey(0), spec)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    # lazy path = render_rays' own march (budget > 0 => lazy_t=True)
    out_lazy = render_rays(params, spec, rspec, occ, oj, dj,
                           training=True, bg_color=0.3)
    assert out_lazy["samples"].t is None  # really took the lazy path
    assert out_lazy["samples"].lattice_pos is not None

    # eager path: march explicitly with lazy_t=False, inherit into render
    eager = march_rays(occ.bitfield, oj, dj, nears, fars, rspec,
                       bitfield_dilated=occ.bitfield_dilated,
                       neighbor_masks=occ.neighbor_masks, lazy_t=False)
    budget = rspec.sample_budget(len(o))
    compact = compact_samples(eager.mask, budget,
                              prefix=rspec.max_samples < rspec.max_steps)
    out_eager = render_rays(params, spec, rspec, occ, oj, dj,
                            training=True, bg_color=0.3,
                            inherited=eager, inherited_compact=compact)

    np.testing.assert_array_equal(np.asarray(out_lazy["samples"].mask),
                                  np.asarray(eager.mask))
    # compacted-slot t bitwise equal at VALID slots (invalid slots are
    # masked everywhere downstream and may hold 0 vs a lattice t)
    v = np.asarray(out_lazy["compact"].valid)
    t_l = np.asarray(out_lazy["compact_t"])
    t_e = np.asarray(out_eager["compact_t"])
    np.testing.assert_array_equal(t_l[v], t_e[v])
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_allclose(np.asarray(out_lazy[k]),
                                   np.asarray(out_eager[k]),
                                   rtol=0, atol=0, err_msg=k)

    # teacher-replay shortcut: inherited_t_c (the student's compacted t)
    # must give the teacher the same render as re-gathering itself
    spec_t = ModelSpec(model_type="hash", bound=2.0, hash_num_levels=4,
                       hash_desired_res=32)
    params_t = init_field(jax.random.PRNGKey(1), spec_t)
    rep_a = render_rays(params_t, spec_t, rspec, occ, oj, dj,
                        training=True, bg_color=0.3,
                        inherited=out_lazy["samples"],
                        inherited_compact=out_lazy["compact"],
                        inherited_t_c=out_lazy["compact_t"])
    rep_b = render_rays(params_t, spec_t, rspec, occ, oj, dj,
                        training=True, bg_color=0.3,
                        inherited=out_lazy["samples"],
                        inherited_compact=out_lazy["compact"])
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_allclose(np.asarray(rep_a[k]),
                                   np.asarray(rep_b[k]),
                                   rtol=0, atol=0, err_msg=k)
