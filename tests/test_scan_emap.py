"""Scan-fusion + error-map coexistence (round-3 VERDICT item 4).

The reference's importance ray sampler (distill_mutual/utils.py:353-381)
and its EMA cell update (utils.py:1120-1133) must compose with the
framework's scan-fused multi-step: the device-resident error map rides
the lax.scan carry.  Because every scan flavor derives step j's key as
fold_in(caller_key, state.step at j) — exactly like the single step —
K fused steps with a constant caller key must reproduce K single steps
BITWISE (same rays, same perturbations, same EMA updates), not merely
statistically.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pvd_tpu.config import ModelSpec, PVDConfig
from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
from pvd_tpu.engine.train_steps import (
    TrainState,
    make_distill_step,
    make_teacher_step,
)
from pvd_tpu.models import init_field
from pvd_tpu.models.api import param_group_label, trainable_label
from pvd_tpu.render import init_occupancy_state
from pvd_tpu.render.occupancy import set_bitfield

K = 4
N_POSES = 3
H = W = 48
INTR = (40.0, 40.0, 24.0, 24.0)
EC = 128 * 128


def _setup(model_type="vm", teacher=False):
    cfg = PVDConfig(num_rays=128, grid_size=32, max_steps=128,
                    max_samples=32, samples_per_ray=8.0, resolution0=24,
                    error_map=True)
    rspec = cfg.render_spec()
    k = jax.random.PRNGKey(0)
    spec_tea = ModelSpec(model_type="hash", hash_num_levels=6,
                         hash_desired_res=128)
    params_tea = init_field(jax.random.fold_in(k, 0), spec_tea)
    spec_stu = ModelSpec(model_type=model_type,
                         vm_resolution=(24, 24, 24))
    params_stu = init_field(jax.random.fold_in(k, 1), spec_stu)
    occ = set_bitfield(
        init_occupancy_state(rspec),
        jax.random.uniform(jax.random.fold_in(k, 2), (32 ** 3,)) < 0.25,
    )
    opt = build_optimizer(
        params_stu, label_fn=param_group_label(spec_stu),
        trainable_fn=trainable_label(spec_stu, ""),
        schedule_main=cosine_schedule(1e-2, 100),
        schedule_lr2=cosine_schedule(1e-3, 100),
    )
    state = TrainState(params=params_stu, opt_state=opt.init(params_stu),
                       occ=occ, step=jnp.int32(0))
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.ops.rays import nerf_matrix_to_ngp

    poses = jnp.stack([
        jnp.asarray(nerf_matrix_to_ngp(
            pose_spherical(30.0 + 40.0 * i, -30.0, 4.0), scale=0.8))
        for i in range(N_POSES)
    ])
    # non-uniform map so the importance draw is nontrivial
    emap = jax.random.uniform(jax.random.fold_in(k, 3), (N_POSES, EC),
                              minval=0.05, maxval=1.0)
    return cfg, rspec, spec_tea, spec_stu, params_tea, occ, opt, state, \
        poses, emap


def _leaves_allclose(a, b, atol):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=atol,
                                   rtol=1e-5)


def test_distill_scan_emap_matches_k_single_steps():
    """One K-step fused distill dispatch with the error map in the carry
    == K single emap steps (same constant caller key): identical final
    params AND identical error map."""
    (cfg, rspec, spec_tea, spec_stu, params_tea, occ, opt, state, poses,
     emap) = _setup()
    common = dict(intrinsics=INTR, H=H, W=W, stage=3, use_error_map=True)
    single = make_distill_step(spec_stu, spec_tea, rspec, opt, cfg, **common)
    fused = make_distill_step(spec_stu, spec_tea, rspec, opt, cfg,
                              scan_steps=K, **common)
    key = jax.random.PRNGKey(7)
    idxs = jnp.asarray([0, 2, 1, 2], jnp.int32)

    st_a, em_a = state, emap
    for j in range(K):
        i = int(idxs[j])
        st_a, row, logs_a = single(st_a, params_tea, occ, poses[i],
                                   em_a[i], key)
        em_a = em_a.at[i].set(row)

    st_b, em_b, logs_b = fused(state, params_tea, occ, poses[idxs], idxs,
                               emap, key)

    assert int(st_a.step) == int(st_b.step) == K
    _leaves_allclose(st_a.params, st_b.params, atol=1e-5)
    np.testing.assert_allclose(np.asarray(em_a), np.asarray(em_b),
                               atol=1e-6)
    # the map did move away from its init on the sampled cells
    assert not np.allclose(np.asarray(em_b), np.asarray(emap))
    assert np.isfinite(np.asarray(logs_b["loss"])).all()
    # last fused step's loss == last single step's loss (bitwise RNG)
    np.testing.assert_allclose(float(logs_b["loss"][-1]),
                               float(logs_a["loss"]), rtol=1e-5)


def test_teacher_scan_emap_matches_k_single_steps():
    """Teacher flavor: the unconditional per-ray-MSE EMA update
    (utils.py:1125-1133) must ride the scan carry identically."""
    (cfg, rspec, _, _, _, occ, _, _, poses, emap) = _setup()
    spec = ModelSpec(model_type="hash", hash_num_levels=6,
                     hash_desired_res=128)
    params = init_field(jax.random.PRNGKey(5), spec)
    opt = build_optimizer(
        params, label_fn=param_group_label(spec),
        trainable_fn=trainable_label(spec, ""),
        schedule_main=cosine_schedule(1e-2, 100),
        schedule_lr2=cosine_schedule(1e-3, 100),
    )
    state = TrainState(params=params, opt_state=opt.init(params), occ=occ,
                       step=jnp.int32(0))
    images = jax.random.uniform(jax.random.PRNGKey(11),
                                (N_POSES, H * W, 4))
    common = dict(intrinsics=INTR, H=H, W=W, image_channels=4,
                  use_error_map=True)
    single = make_teacher_step(spec, rspec, opt, cfg, **common)
    fused = make_teacher_step(spec, rspec, opt, cfg, scan_steps=K, **common)
    key = jax.random.PRNGKey(7)
    idxs = jnp.asarray([1, 0, 1, 2], jnp.int32)

    st_a, em_a = state, emap
    for j in range(K):
        i = int(idxs[j])
        st_a, row, _ = single(st_a, poses[i], images[i], em_a[i], key)
        em_a = em_a.at[i].set(row)

    st_b, em_b, logs_b = fused(state, images, idxs, poses[idxs], emap, key)

    assert int(st_a.step) == int(st_b.step) == K
    _leaves_allclose(st_a.params, st_b.params, atol=1e-5)
    np.testing.assert_allclose(np.asarray(em_a), np.asarray(em_b),
                               atol=1e-6)
    assert not np.allclose(np.asarray(em_b), np.asarray(emap))
    assert np.isfinite(np.asarray(logs_b["loss"])).all()


def test_scan_nonemap_matches_k_single_steps():
    """RNG-contract regression: even WITHOUT the error map, K fused steps
    with a constant caller key == K single steps (the scan body folds the
    live step counter instead of pre-splitting keys)."""
    (cfg0, rspec, spec_tea, spec_stu, params_tea, occ, opt, state, poses,
     _) = _setup()
    import dataclasses

    cfg = dataclasses.replace(cfg0, error_map=False)
    common = dict(intrinsics=INTR, H=H, W=W, stage=3)
    single = make_distill_step(spec_stu, spec_tea, rspec, opt, cfg, **common)
    fused = make_distill_step(spec_stu, spec_tea, rspec, opt, cfg,
                              scan_steps=K, **common)
    key = jax.random.PRNGKey(3)
    idxs = jnp.asarray([0, 1, 2, 0], jnp.int32)

    st_a = state
    for j in range(K):
        st_a, logs_a = single(st_a, params_tea, occ, poses[int(idxs[j])],
                              key)
    st_b, logs_b = fused(state, params_tea, occ, poses[idxs], key)
    _leaves_allclose(st_a.params, st_b.params, atol=1e-5)
    np.testing.assert_allclose(float(logs_b["loss"][-1]),
                               float(logs_a["loss"]), rtol=1e-5)


def test_trainer_wires_scan_with_error_map(tmp_path_factory):
    """End-to-end: a distill Trainer with BOTH error_map and scan_steps on
    must take the fused path (scan cache key with emap=True) and update
    the map."""
    import os

    from pvd_tpu.data.provider import NeRFDataset
    from pvd_tpu.data.synth import make_synthetic_scene
    from pvd_tpu.engine import checkpoint as ckpt
    from pvd_tpu.engine.trainer import Trainer

    root = str(tmp_path_factory.mktemp("synth_scene_se"))
    make_synthetic_scene(root, n_train=8, n_val=2, n_test=2, H=40, W=40)

    def _cfg(ws, **kw):
        base = dict(
            path=root, workspace=ws, iters=30, num_rays=128, grid_size=32,
            max_steps=128, max_samples=32, update_extra_interval=16,
            max_ray_batch=1024, density_thresh=0.01, lr=1e-2, seed=0,
        )
        base.update(kw)
        return PVDConfig(**base)

    ws_t = str(tmp_path_factory.mktemp("ws_tea_se"))
    cfg_t = _cfg(ws_t, model_type="hash")
    tea = Trainer(cfg_t, mode="teacher")
    tea.train(NeRFDataset(cfg_t, "train"))
    tea_path = ckpt.latest_checkpoint(
        os.path.join(ws_t, "checkpoints"), "hash")

    ws = str(tmp_path_factory.mktemp("ws_dis_se"))
    cfg = _cfg(ws, model_type="vm", teacher_type="hash", iters=16,
               stage1_iters=0, stage2_iters=0, resolution0=24,
               scan_steps=4, error_map=True)
    tr = Trainer(cfg, mode="distill")
    tr.load_teacher(tea_path)
    tr.train(NeRFDataset(cfg, "train"))
    assert int(tr.state.step) == 16
    scan_keys = [k for k in tr._steps if k[0] == "scan"]
    assert scan_keys and all(k[-1] is True for k in scan_keys), \
        list(tr._steps)
    em = np.asarray(tr.error_map)
    assert (em < 0.999).any() and np.isfinite(em).all()
    tr.close()
    tea.close()


def test_host_scan_matches_k_single_host_steps():
    """Host-batcher flavor (round-4 VERDICT item 7): K fused host steps
    (make_teacher_step_host(scan_steps=K)) with a constant caller key ==
    K single host steps given the SAME drawn batches — identical final
    params and identical per-ray loss rows (the host applies those rows
    to its map, so row equality implies map equality)."""
    from pvd_tpu.engine.train_steps import make_teacher_step_host

    (cfg, rspec, _, _, _, occ, _, _, poses, _) = _setup()
    spec = ModelSpec(model_type="hash", hash_num_levels=6,
                     hash_desired_res=128)
    params = init_field(jax.random.PRNGKey(5), spec)
    opt = build_optimizer(
        params, label_fn=param_group_label(spec),
        trainable_fn=trainable_label(spec, ""),
        schedule_main=cosine_schedule(1e-2, 100),
        schedule_lr2=cosine_schedule(1e-3, 100),
    )
    state = TrainState(params=params, opt_state=opt.init(params), occ=occ,
                       step=jnp.int32(0))
    common = dict(intrinsics=INTR, H=H, W=W, image_channels=4,
                  use_error_map=True)
    single = make_teacher_step_host(spec, rspec, opt, cfg, **common)
    fused = make_teacher_step_host(spec, rspec, opt, cfg, scan_steps=K,
                                   **common)
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(3)
    idxs = rng.integers(0, N_POSES, K)
    inds_k = jnp.asarray(rng.integers(0, H * W, (K, cfg.num_rays)),
                         jnp.int32)
    pix_k = jnp.asarray(rng.random((K, cfg.num_rays, 4)), jnp.float32)

    st_a = state
    rows_a = []
    for j in range(K):
        st_a, per_ray, _ = single(st_a, poses[int(idxs[j])], inds_k[j],
                                  pix_k[j], key)
        rows_a.append(np.asarray(per_ray))

    st_b, per_rays, logs_b = fused(state, poses[jnp.asarray(idxs)],
                                   inds_k, pix_k, key)

    assert int(st_a.step) == int(st_b.step) == K
    _leaves_allclose(st_a.params, st_b.params, atol=1e-5)
    np.testing.assert_allclose(np.asarray(per_rays), np.stack(rows_a),
                               atol=1e-6)
    assert np.isfinite(np.asarray(logs_b["loss"])).all()


def test_trainer_wires_host_scan_with_error_map(tmp_path_factory):
    """End-to-end: a teacher Trainer with preload=False (host batcher),
    error_map AND scan_steps must take the fused host path
    ("host_scan" cache key) and update the host-resident map."""
    from pvd_tpu.data.provider import NeRFDataset
    from pvd_tpu.data.synth import make_synthetic_scene
    from pvd_tpu.engine.trainer import Trainer

    root = str(tmp_path_factory.mktemp("synth_scene_hs"))
    make_synthetic_scene(root, n_train=8, n_val=2, n_test=2, H=40, W=40)

    ws = str(tmp_path_factory.mktemp("ws_tea_hs"))
    cfg = PVDConfig(
        path=root, workspace=ws, iters=32, num_rays=128, grid_size=32,
        max_steps=128, max_samples=32, update_extra_interval=16,
        max_ray_batch=1024, density_thresh=0.01, lr=1e-2, seed=0,
        model_type="hash", preload=False, error_map=True, scan_steps=4,
    )
    tr = Trainer(cfg, mode="teacher")
    tr.train(NeRFDataset(cfg, "train"))
    assert int(tr.state.step) == 32
    host_scan_keys = [k for k in tr._steps if k[0] == "host_scan"]
    assert host_scan_keys and all(k[-2] == 4 for k in host_scan_keys), \
        list(tr._steps)
    assert isinstance(tr.error_map, np.ndarray)
    em = tr.error_map
    assert (em < 0.999).any() and np.isfinite(em).all()
    tr.close()
