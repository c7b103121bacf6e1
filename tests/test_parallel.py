"""Data-parallel (shard_map) tests on the virtual 8-device CPU mesh.

VERDICT round-1 item #2: DP-vs-single-device equivalence, a DP
training-improves test through the Trainer/CLI path, occupancy-update and
eval under the mesh, and uneven num_rays handling.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pvd_tpu.config import ModelSpec, PVDConfig
from pvd_tpu.data.synth import make_synthetic_scene
from pvd_tpu.data.provider import NeRFDataset
from pvd_tpu.engine.optim import build_optimizer, cosine_schedule
from pvd_tpu.engine.train_steps import TrainState, make_distill_step
from pvd_tpu.engine.trainer import Trainer
from pvd_tpu.models import init_field
from pvd_tpu.models.api import param_group_label, trainable_label
from pvd_tpu.parallel import make_dp_distill_step, make_ray_mesh
from pvd_tpu.render import init_occupancy_state
from pvd_tpu.render.occupancy import set_bitfield

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DEV, jax.devices()
    return make_ray_mesh(N_DEV)


def _distill_setup(num_rays):
    cfg = PVDConfig(num_rays=num_rays, grid_size=32, max_steps=128,
                    max_samples=32, samples_per_ray=8.0, resolution0=24)
    rspec = cfg.render_spec()
    spec_tea = ModelSpec(model_type="hash", hash_num_levels=6,
                         hash_desired_res=128)
    spec_stu = ModelSpec(model_type="vm", vm_resolution=(24, 24, 24))
    k = jax.random.PRNGKey(0)
    params_tea = init_field(jax.random.fold_in(k, 0), spec_tea)
    params_stu = init_field(jax.random.fold_in(k, 1), spec_stu)
    occ = set_bitfield(
        init_occupancy_state(rspec),
        jax.random.uniform(jax.random.fold_in(k, 2),
                           (32 ** 3,)) < 0.25,
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

    pose = jnp.asarray(
        nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0), scale=0.8))
    return cfg, rspec, spec_tea, spec_stu, params_tea, occ, opt, state, pose


def test_dp_distill_step_runs_and_improves_loss(mesh):
    """50 DP steps through stage 3 must reduce the distill loss."""
    (cfg, rspec, spec_tea, spec_stu, params_tea, occ, opt, state,
     pose) = _distill_setup(num_rays=256)
    step = make_dp_distill_step(
        spec_stu, spec_tea, rspec, opt, cfg, mesh,
        intrinsics=(40.0, 40.0, 24.0, 24.0), H=48, W=48, stage=3,
    )
    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(50):
        key, kk = jax.random.split(key)
        state, logs = step(state, params_tea, occ, pose, kk)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7, losses


def _fixed_rays(pose, n):
    from pvd_tpu.ops.rays import get_rays

    rays = get_rays(jax.random.PRNGKey(9), pose[None],
                    (40.0, 40.0, 24.0, 24.0), 48, 48, n)
    return rays["rays_o"][0], rays["rays_d"][0]


def test_dp_grads_match_singlechip(mesh):
    """Gradient equivalence on the SAME rays (no perturb): the shard_map
    loss sharded over 8 devices must reproduce the single-chip gradients.

    With the point losses off, the stage-3 objective is a plain per-ray
    mean, for which mean-of-shard-means == global mean exactly -> grads
    must match to fp tolerance.  With point losses on, per-shard masked
    normalisation (sum/valid_per_shard) differs slightly from the global
    one -> direction must still agree (cosine > 0.98)."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from pvd_tpu.engine.train_steps import distill_loss

    (cfg, rspec, spec_tea, spec_stu, params_tea, occ, opt, state,
     pose) = _distill_setup(num_rays=256)
    o, d = _fixed_rays(pose, 256)
    bg = jnp.full((256, 3), 0.6)
    step_i = jnp.int32(7)

    def run_case(cfg_case):
        rs_local = dataclasses.replace(rspec)  # per-shard budget from N_loc

        def sc_loss(p):
            return distill_loss(p, params_tea, spec_stu, spec_tea, rspec,
                                cfg_case, 3, occ, occ, o, d, bg, None,
                                step_i)[0]

        def local_loss(p, o_l, d_l, bg_l):
            loss = distill_loss(p, params_tea, spec_stu, spec_tea, rs_local,
                                cfg_case, 3, occ, occ, o_l, d_l, bg_l, None,
                                step_i)[0]
            return jax.lax.pmean(loss, "rays")

        # check_vma=False: the VM plane sampler's custom_vjp backward is
        # opaque to shard_map's replication checker, so grad-through-
        # shard_map can't statically prove the params cotangent replicated.
        # The psum insertion itself is unaffected — this very test verifies
        # the resulting gradients against single-chip numerically.
        smap = jax.shard_map(
            local_loss, mesh=mesh,
            in_specs=(P(), P("rays"), P("rays"), P("rays")),
            out_specs=P(), check_vma=False,
        )
        # grad-of-shard_map must run under jit: eagerly, the unsharded ray
        # arrays' replicated layout conflicts with in_specs=P('rays')
        g_sc = jax.jit(jax.grad(sc_loss))(state.params)
        g_dp = jax.jit(jax.grad(lambda p: smap(p, o, d, bg)))(state.params)
        return g_sc, g_dp

    # exact case: rgb-only objective
    cfg_rgb = dataclasses.replace(
        cfg, loss_rate_fea_sc=0.0, loss_rate_sigma=0.0, loss_rate_color=0.0)
    g_sc, g_dp = run_case(cfg_rgb)
    flat_sc = jax.tree_util.tree_leaves(g_sc)
    flat_dp = jax.tree_util.tree_leaves(g_dp)
    for a, b in zip(flat_sc, flat_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)

    # full objective: direction agreement
    g_sc, g_dp = run_case(cfg)
    va = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(g_sc)])
    vb = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(g_dp)])
    cos = float(np.dot(va, vb) /
                (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))
    assert cos > 0.98, cos


def test_trainer_dp_distill_runs(tmp_path):
    """Trainer-level DP distillation: teacher ckpt -> DP student steps over
    the 8-device mesh, eval under the mesh."""
    root = str(tmp_path / "scene")
    make_synthetic_scene(root, n_train=6, n_val=1, n_test=1, H=32, W=32)
    cfg_t = PVDConfig(
        path=root, workspace=str(tmp_path / "wt"), iters=30, num_rays=128,
        grid_size=16, max_steps=64, max_samples=24, density_thresh=0.01,
        model_type="hash", eval_interval=1000, autotune_budget=False,
        samples_per_ray=8.0,
    )
    tr_t = Trainer(cfg_t, mode="teacher")
    tr_t.train(NeRFDataset(cfg_t, "train"))
    tea_path = tr_t.save()

    cfg = PVDConfig(
        path=root, workspace=str(tmp_path / "ws"), iters=16, num_rays=128,
        grid_size=16, max_steps=64, max_samples=24, density_thresh=0.01,
        model_type="vm", teacher_type="hash", resolution0=12,
        stage1_iters=4, stage2_iters=10, n_devices=N_DEV,
        eval_interval=1000, autotune_budget=False, samples_per_ray=8.0,
    )
    tr = Trainer(cfg, mode="distill")
    assert tr.mesh is not None
    tr.load_teacher(tea_path)
    tr.train(NeRFDataset(cfg, "train"))
    assert int(tr.state.step) == 16
    assert np.isfinite(float(tr._last_metrics["loss"]))
    stats = tr.evaluate(NeRFDataset(cfg, "test"))
    assert np.isfinite(stats["psnr"]), stats


def test_trainer_dp_teacher_improves_psnr(tmp_path):
    """Trainer-level DP: teacher training over the 8-device mesh improves
    train PSNR and runs eval + occ updates under the mesh."""
    root = str(tmp_path / "scene")
    make_synthetic_scene(root, n_train=8, n_val=1, n_test=1, H=48, W=48)
    cfg = PVDConfig(
        path=root, workspace=str(tmp_path / "ws"), iters=120,
        num_rays=500,  # deliberately NOT divisible by 8: rounded up to 504
        grid_size=32, max_steps=128, max_samples=48, density_thresh=0.01,
        model_type="hash", n_devices=N_DEV, eval_interval=1000,
        autotune_budget=False,
    )
    train_ds = NeRFDataset(cfg, "train")
    tr = Trainer(cfg, mode="teacher")
    assert tr.mesh is not None
    assert cfg.num_rays == 504  # rounded up to a multiple of n_devices
    tr.train(train_ds, max_steps=120)
    assert float(tr._last_metrics["psnr"]) > 14.0, dict(tr._last_metrics)
    # eval path under the mesh
    stats = tr.evaluate(NeRFDataset(cfg, "val"))
    assert stats["psnr"] > 10.0, stats


def test_dp_distill_error_map_updates(mesh):
    """VERDICT r2 #6: error-map importance sampling under DP.

    The replicated 128^2 coarse map must (a) drive the per-shard ray
    draws, and (b) receive a non-uniform EMA update from the sharded
    per-ray rgb losses at stage 3 — only sampled cells change.
    """
    (cfg, rspec, spec_tea, spec_stu, params_tea, occ, opt, state,
     pose) = _distill_setup(num_rays=256)
    step = make_dp_distill_step(
        spec_stu, spec_tea, rspec, opt, cfg, mesh,
        intrinsics=(40.0, 40.0, 24.0, 24.0), H=48, W=48, stage=3,
        use_error_map=True,
    )
    emap = jnp.ones((128 * 128,), jnp.float32)
    key = jax.random.PRNGKey(5)
    for i in range(3):
        key, kk = jax.random.split(key)
        state, emap, logs = step(state, params_tea, occ, pose, emap, kk)
    e = np.asarray(emap)
    assert np.isfinite(e).all()
    changed = (e != 1.0).sum()
    # 256 rays/step x 3 steps: some cells updated, most untouched
    assert 0 < changed <= 3 * 256, changed
    # the update is the per-ray loss EMA, so changed cells moved off 1.0
    assert float(np.abs(e[e != 1.0] - 1.0).max()) > 1e-4


def test_dp_teacher_error_map_matches_singlechip_shape(mesh):
    """DP teacher step with error map: emap-driven draws + EMA update run
    under the mesh and return a replicated, finite map."""
    from pvd_tpu.parallel import make_dp_teacher_step

    (cfg, rspec, spec_tea, spec_stu, params_tea, occ, opt, state,
     pose) = _distill_setup(num_rays=256)
    step = make_dp_teacher_step(
        spec_stu, rspec, opt, cfg, mesh,
        intrinsics=(40.0, 40.0, 24.0, 24.0), H=48, W=48,
        image_channels=4, use_error_map=True,
    )
    img = jnp.asarray(
        np.random.default_rng(0).random((48 * 48, 4), np.float32))
    emap = jnp.ones((128 * 128,), jnp.float32)
    state, emap, metrics = step(state, pose, img, emap,
                                jax.random.PRNGKey(1))
    e = np.asarray(emap)
    assert np.isfinite(e).all() and (e != 1.0).any()
    assert np.isfinite(float(metrics["psnr"]))


def test_dp_distill_scan_steps(mesh):
    """scan_steps fuses K SHARDED distill steps into one dispatch
    (shard_map composes under lax.scan): step counter advances by K,
    stacked [K] logs are finite, and the loss still improves."""
    (cfg, rspec, spec_tea, spec_stu, params_tea, occ, opt, state,
     pose) = _distill_setup(num_rays=256)
    K = 4
    step = make_dp_distill_step(
        spec_stu, spec_tea, rspec, opt, cfg, mesh,
        intrinsics=(40.0, 40.0, 24.0, 24.0), H=48, W=48, stage=3,
        scan_steps=K,
    )
    key = jax.random.PRNGKey(3)
    poses_k = jnp.tile(pose[None], (K, 1, 1))
    losses = []
    for _ in range(10):
        state, logs = step(state, params_tea, occ, poses_k, key)
        losses.extend(np.asarray(logs["loss"]).tolist())
    assert int(state.step) == 40
    assert np.isfinite(losses).all()
    assert np.mean(losses[-8:]) < np.mean(losses[:8]) * 0.8, losses


def test_dp_teacher_scan_steps(mesh):
    """Teacher scan under the mesh: K sharded steps in one dispatch, GT
    sliced from the replicated image stack inside the scan body."""
    from pvd_tpu.parallel import make_dp_teacher_step

    cfg = PVDConfig(num_rays=256, grid_size=32, max_steps=128,
                    max_samples=32, samples_per_ray=8.0)
    rspec = cfg.render_spec()
    spec = ModelSpec(model_type="hash", hash_num_levels=6,
                     hash_desired_res=128)
    k = jax.random.PRNGKey(0)
    params = init_field(k, spec)
    occ = set_bitfield(
        init_occupancy_state(rspec),
        jax.random.uniform(jax.random.fold_in(k, 2), (32 ** 3,)) < 0.25,
    )
    opt = build_optimizer(
        params, label_fn=param_group_label(spec),
        trainable_fn=trainable_label(spec, ""),
        schedule_main=cosine_schedule(1e-2, 100),
        schedule_lr2=cosine_schedule(1e-3, 100),
    )
    state = TrainState(params=params, opt_state=opt.init(params),
                       occ=occ, step=jnp.int32(0))
    from pvd_tpu.data.poses import pose_spherical
    from pvd_tpu.ops.rays import nerf_matrix_to_ngp

    H = W = 48
    pose = jnp.asarray(
        nerf_matrix_to_ngp(pose_spherical(30.0, -30.0, 4.0), scale=0.8))
    images = jax.random.uniform(jax.random.fold_in(k, 5), (3, H * W, 4))
    K = 4
    step = make_dp_teacher_step(
        spec, rspec, opt, cfg, mesh, intrinsics=(40.0, 40.0, 24.0, 24.0),
        H=H, W=W, image_channels=4, scan_steps=K,
    )
    poses_k = jnp.tile(pose[None], (K, 1, 1))
    idxs = jnp.asarray([0, 1, 2, 0], jnp.int32)
    state, logs = step(state, images, idxs, poses_k, jax.random.PRNGKey(7))
    assert int(state.step) == K
    assert logs["loss"].shape == (K,)
    assert np.isfinite(np.asarray(logs["loss"])).all()
    assert np.isfinite(np.asarray(logs["psnr"])).all()
