"""Probe-march exactness, global sample compaction, and budget autotuning."""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec, RenderSpec
from pvd_tpu.models import init_field
from pvd_tpu.ops.aabb import near_far_from_aabb
from pvd_tpu.render import init_occupancy_state, march_rays, render_rays
from pvd_tpu.render.occupancy import build_neighbor_masks, set_bitfield
from pvd_tpu.render.renderer import compact_samples

SQRT3 = math.sqrt(3.0)


def _spec(**kw):
    base = dict(bound=1.0, grid_size=32, max_steps=128, max_samples=32,
                density_thresh=0.01)
    base.update(kw)
    return RenderSpec(**base)


def _rays(n, rng):
    o = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    o[:, 2] = -2.5
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_probe_march_matches_plain_lattice():
    """The packed-neighborhood probe path must produce EXACTLY the samples
    of a direct per-lattice-point bitfield lookup."""
    rspec = _spec()
    H = rspec.grid_size
    rng = np.random.default_rng(3)
    bf3 = rng.uniform(size=(H, H, H)) < 0.25
    bitfield = jnp.asarray(bf3.reshape(-1))
    masks = build_neighbor_masks(bitfield, H)
    from pvd_tpu.render.occupancy import NB_WORDS, SUPER_G

    assert masks.shape == ((H // SUPER_G) ** 3, NB_WORDS)

    o, d = _rays(32, rng)
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(o, d, aabb)

    plain = march_rays(bitfield, o, d, nears, fars, rspec)
    probe = march_rays(bitfield, o, d, nears, fars, rspec,
                       neighbor_masks=masks)
    assert rspec.effective_probe_stride > 1
    np.testing.assert_array_equal(np.asarray(plain.mask),
                                  np.asarray(probe.mask))
    np.testing.assert_allclose(
        np.asarray(plain.t)[np.asarray(plain.mask)],
        np.asarray(probe.t)[np.asarray(probe.mask)], atol=1e-6)


def test_compact_samples_first_m_in_order():
    mask = jnp.asarray([[False, True, True], [True, False, True]])
    c = compact_samples(mask, budget=3)
    assert int(c.total) == 4
    np.testing.assert_array_equal(np.asarray(c.idx), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(c.valid), [True, True, True])
    np.testing.assert_array_equal(np.asarray(c.ray_id), [0, 0, 1])


def test_compact_samples_prefix_matches_generic():
    """The prefix (scatter-light) formulation must equal the generic one on
    prefix masks, including zero-count rays and budget truncation (both
    keep whole leading rays, reference-style — a proportional per-ray-tail
    policy was A/B'd and is worse under heavy truncation)."""
    rng = np.random.default_rng(9)
    N, S = 64, 16
    cnt = rng.integers(0, S + 1, N)
    cnt[::7] = 0  # zero-count rays
    mask = jnp.asarray(np.arange(S)[None, :] < cnt[:, None])
    for budget in (32, 128, N * S):
        a = compact_samples(mask, budget)
        b = compact_samples(mask, budget, prefix=True)
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
        np.testing.assert_array_equal(
            np.asarray(jnp.where(a.valid, a.ray_id, 0)),
            np.asarray(jnp.where(b.valid, b.ray_id, 0)))
        assert int(a.total) == int(b.total)


def test_compacted_render_matches_dense():
    """With a non-truncating budget the compacted render must equal the
    dense path bit-for-bit (same samples, same field values)."""
    spec = ModelSpec(model_type="hash", hash_num_levels=4,
                     hash_desired_res=64)
    params = init_field(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(5)
    rspec_dense = _spec(samples_per_ray=0.0)
    rspec_comp = _spec(samples_per_ray=32.0)  # budget == N*S: no truncation
    H = rspec_dense.grid_size
    occ = set_bitfield(
        init_occupancy_state(rspec_dense),
        jnp.asarray((rng.uniform(size=(H * H * H,)) < 0.3)),
    )
    o, d = _rays(16, rng)
    out_d = render_rays(params, spec, rspec_dense, occ, o, d, training=True)
    out_c = render_rays(params, spec, rspec_comp, occ, o, d, training=True)
    assert out_c["compact"] is not None and out_d["compact"] is None
    np.testing.assert_allclose(np.asarray(out_d["image"]),
                               np.asarray(out_c["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d["depth"]),
                               np.asarray(out_c["depth"]), atol=1e-5)
    # compacted point tensors align with the dense valid entries, in order
    dm = np.asarray(out_d["mask"]).reshape(-1)
    dense_logit = np.asarray(out_d["sigma_logit"]).reshape(-1)[dm]
    cm = np.asarray(out_c["mask"])
    comp_logit = np.asarray(out_c["sigma_logit"])[cm]
    np.testing.assert_allclose(dense_logit, comp_logit, atol=1e-5)


def test_truncating_budget_stays_finite_and_monotone():
    """A tiny budget drops trailing samples but keeps a valid image."""
    spec = ModelSpec(model_type="hash", hash_num_levels=4,
                     hash_desired_res=64)
    params = init_field(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(6)
    rspec = _spec(samples_per_ray=1.0)
    H = rspec.grid_size
    occ = set_bitfield(init_occupancy_state(rspec),
                       jnp.ones((H * H * H,), bool))
    o, d = _rays(16, rng)
    out = render_rays(params, spec, rspec, occ, o, d, training=True)
    assert bool(jnp.all(jnp.isfinite(out["image"])))
    c = out["compact"]
    assert int(jnp.sum(c.valid)) == c.idx.shape[0]  # fully used budget
    assert float(out["compact_frac"]) > 1.0  # truncation happened


def test_eval_renderer_escalates_on_truncation():
    """A budget too small for the scene must NOT black out trailing rays:
    the eval renderer marches the FULL trajectory (max_samples never clips
    eval rays) and its 1x/4x/16x ladder re-renders truncated chunks.  A
    base budget of 2/ray on a ~25%-occupied grid (mean ~15 valid/ray)
    must match the uncompacted full-trajectory render exactly."""
    import dataclasses

    from pvd_tpu.engine.train_steps import make_eval_renderer

    spec = ModelSpec(model_type="hash", hash_num_levels=4,
                     hash_desired_res=64)
    params = init_field(jax.random.PRNGKey(0), spec)
    H = 32
    rspec_tight = _spec(samples_per_ray=2.0)   # truncating base budget
    # exact comparator: uncompacted, full lattice as the sample axis
    rspec_exact = dataclasses.replace(
        _spec(samples_per_ray=0.0), max_samples=_spec().max_steps)
    rng = np.random.default_rng(4)
    occ = set_bitfield(
        init_occupancy_state(rspec_tight),
        jnp.asarray(rng.uniform(size=(32 ** 3,)) < 0.25))
    render_tight = make_eval_renderer(spec, rspec_tight, chunk=256)
    render_exact = make_eval_renderer(spec, rspec_exact, chunk=256)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5
    intr = (30.0, 30.0, H / 2, H / 2)
    img_t, dep_t = render_tight(params, occ, pose, intr, H, H)
    img_e, dep_e = render_exact(params, occ, pose, intr, H, H)
    np.testing.assert_allclose(img_t, img_e, atol=1e-5)
    np.testing.assert_allclose(dep_t, dep_e, atol=1e-5)


def test_autotune_escalates_smax_on_dense_grid(tmp_path):
    """Over-dense occupancy triggers S_max escalation (VERDICT #5)."""
    from pvd_tpu.config import PVDConfig
    from pvd_tpu.data.provider import NeRFDataset
    from pvd_tpu.data.synth import make_synthetic_scene
    from pvd_tpu.engine.trainer import Trainer

    root = str(tmp_path / "scene")
    make_synthetic_scene(root, n_train=4, n_val=1, n_test=1, H=32, W=32)
    cfg = PVDConfig(
        path=root,
        iters=40, num_rays=64, grid_size=32, max_steps=256, max_samples=16,
        samples_per_ray=4.0, density_thresh=1e-4, model_type="hash",
        # small interval: retuning is gated behind a 16-update grid warmup
        update_extra_interval=2, workspace=str(tmp_path / "ws"),
        preload=True, eval_interval=1000,
    )
    ds = NeRFDataset(cfg, "train")
    tr = Trainer(cfg, mode="teacher")
    # force a fully-occupied grid so budget_hit saturates; the tiny
    # density_thresh keeps refreshes near-fully occupied too
    tr.state = tr.state.replace(
        occ=set_bitfield(tr.state.occ,
                         jnp.ones_like(tr.state.occ.bitfield)))
    tr.train(ds, max_steps=40)
    assert tr.rspec.max_samples > 16, tr.rspec
    assert tr.rspec.samples_per_ray >= 4.0
