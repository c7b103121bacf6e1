"""Trainer orchestration features added in round 2:

  * GT alpha-compositing with a background model (ADVICE r1 #1; reference
    just_train_tea/utils.py:777-787)
  * EMA restore on checkpoint load (ADVICE r1 #2)
  * mid-training eval + best-checkpoint tracking with EMA swap
    (just_train_tea/utils.py:527-538, distill_mutual/utils.py:1450-1471)
  * distill-side error-map EMA update (distill_mutual/utils.py:1120-1130)
  * --rand_pose orbit injection into distill epochs
  * aabb-adaptive VM upsample resolutions (distill_mutual/utils.py:884-895)
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pvd_tpu.config import PVDConfig
from pvd_tpu.data.provider import NeRFDataset
from pvd_tpu.data.synth import make_synthetic_scene
from pvd_tpu.engine import checkpoint as ckpt
from pvd_tpu.engine.trainer import Trainer


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_scene_tf"))
    make_synthetic_scene(root, n_train=8, n_val=2, n_test=2, H=40, W=40)
    return root


def _cfg(scene, ws, **kw):
    base = dict(
        path=scene, workspace=ws, iters=40, num_rays=256, grid_size=32,
        max_steps=128, max_samples=32, update_extra_interval=16,
        max_ray_batch=1024, density_thresh=0.01, lr=1e-2, seed=0,
    )
    base.update(kw)
    return PVDConfig(**base)


def test_compose_gt_with_background_model():
    """RGBA GT must composite on white when bg_radius > 0 (the round-1 code
    trained against premultiplied/black pixels)."""
    from pvd_tpu.engine.train_steps import compose_gt

    pix = jnp.asarray(
        [[0.8, 0.4, 0.2, 1.0],  # opaque
         [0.5, 0.5, 0.5, 0.0],  # fully transparent -> pure background
         [0.4, 0.4, 0.4, 0.5]]
    )
    gt, bg = compose_gt(pix, 4, bg_radius=32.0, k_bg=jax.random.PRNGKey(0))
    assert bg == 1.0
    np.testing.assert_allclose(np.asarray(gt[0]), [0.8, 0.4, 0.2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt[1]), [1.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt[2]), [0.7, 0.7, 0.7], atol=1e-6)

    # without a bg model the background is random per pixel
    gt2, bg2 = compose_gt(pix, 4, bg_radius=-1.0, k_bg=jax.random.PRNGKey(0))
    assert bg2.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(gt2[1]), np.asarray(bg2[1]), atol=1e-6)
    # RGB-only images pass through
    gt3, bg3 = compose_gt(pix[:, :3], 3, bg_radius=-1.0,
                          k_bg=jax.random.PRNGKey(0))
    assert bg3 == 1.0
    np.testing.assert_allclose(np.asarray(gt3), np.asarray(pix[:, :3]))


def test_ema_restored_on_load(scene, tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ws_ema"))
    cfg = _cfg(scene, ws, model_type="hash", iters=20, ema_decay=0.9)
    tr = Trainer(cfg, mode="teacher")
    ds = NeRFDataset(cfg, "train")
    tr.train(ds)
    assert tr.state.ema_params is not None
    saved_ema = jax.tree_util.tree_map(np.asarray, tr.state.ema_params)

    tr2 = Trainer(cfg, mode="teacher")
    assert tr2.try_resume()
    got = jax.tree_util.tree_map(np.asarray, tr2.state.ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(saved_ema),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, atol=1e-6)
    # EMA at decay 0.9 after 20 steps should differ from the raw params
    diffs = [
        float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
        for e, p in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(
                            jax.tree_util.tree_map(np.asarray,
                                                   tr2.state.params)))
    ]
    assert max(diffs) > 0.0


def test_best_checkpoint_tracked_during_training(scene, tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ws_best"))
    cfg = _cfg(scene, ws, model_type="hash", iters=32, eval_interval=1,
               ema_decay=0.95)
    tr = Trainer(cfg, mode="teacher")
    train_ds = NeRFDataset(cfg, "train")
    valid_ds = NeRFDataset(cfg, "val")
    tr.train(train_ds, valid_ds=valid_ds)

    best = os.path.join(ws, "checkpoints", "hash_best.ckpt")
    assert os.path.exists(best)
    payload = ckpt.load_checkpoint(best)
    # the best ckpt's params ARE the EMA weights (EMA swap, utils.py:1450+)
    for a, b in zip(jax.tree_util.tree_leaves(payload["params"]),
                    jax.tree_util.tree_leaves(payload["ema_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert payload["stats"]["psnr"] == pytest.approx(tr.best_psnr)
    # best tracked the max of the recorded evals
    assert tr.best_psnr > 0


def test_distill_error_map_updates(scene, tmp_path_factory):
    """The stage-3 distill step must EMA-update the per-pose error map from
    the per-ray rgb loss (VERDICT r1 missing #3)."""
    ws_t = str(tmp_path_factory.mktemp("ws_tea_em"))
    cfg_t = _cfg(scene, ws_t, model_type="hash", iters=30)
    tea = Trainer(cfg_t, mode="teacher")
    tea.train(NeRFDataset(cfg_t, "train"))
    tea_path = ckpt.latest_checkpoint(
        os.path.join(ws_t, "checkpoints"), "hash")

    ws = str(tmp_path_factory.mktemp("ws_dis_em"))
    cfg = _cfg(scene, ws, model_type="hash", teacher_type="hash", iters=12,
               stage1_iters=0, stage2_iters=0, error_map=True, num_rays=128)
    tr = Trainer(cfg, mode="distill")
    tr.load_teacher(tea_path)
    ds = NeRFDataset(cfg, "train")
    tr.train(ds)
    em = np.asarray(tr.error_map)
    assert em.shape[1] == 128 * 128
    # cells sampled during the 12 steps were EMA-pulled away from the 1.0
    # init toward the (small) per-ray loss
    assert (em < 0.999).any()
    assert np.isfinite(em).all()


def test_rand_pose_injection(scene, tmp_path):
    cfg = _cfg(scene, str(tmp_path / "ws_rp2"), rand_pose=2,
               data_type="synthetic")
    tr = Trainer(cfg, mode="distill")
    ds = NeRFDataset(cfg, "train")
    # direct comparison: rand_pose=-1 vs rand_pose=2
    cfg0 = _cfg(scene, str(tmp_path / "ws_rp-1"), rand_pose=-1)
    tr0 = Trainer(cfg0, mode="distill")
    p0 = tr0._distill_epoch_poses(np.random.default_rng(0), ds)
    p2 = tr._distill_epoch_poses(np.random.default_rng(0), ds)
    assert len(p2) == len(p0) + len(p0) // 2
    # injected poses are valid c2w: bottom row [0,0,0,1], finite
    assert np.allclose(p2[:, 3], [0, 0, 0, 1], atol=1e-6)
    assert np.isfinite(p2).all()

    cfg1 = _cfg(scene, str(tmp_path / "ws_rp0"), rand_pose=0)
    tr1 = Trainer(cfg1, mode="distill")
    p1 = tr1._distill_epoch_poses(np.random.default_rng(0), ds)
    assert len(p1) == len(p0)  # only-orbit mode keeps the epoch size
    # orbit poses look at the origin from radius 3.2
    r = np.linalg.norm(p1[:, :3, 3], axis=-1)
    np.testing.assert_allclose(r, 3.2, atol=1e-5)


def test_vm_upsample_wired_in_distill(scene, tmp_path_factory):
    """--upsample_model_steps on a VM student must shrink AND upsample with
    aabb-adaptive per-axis resolutions (ADVICE r1 #3)."""
    ws_t = str(tmp_path_factory.mktemp("ws_tea_vm"))
    cfg_t = _cfg(scene, ws_t, model_type="hash", iters=30)
    tea = Trainer(cfg_t, mode="teacher")
    tea.train(NeRFDataset(cfg_t, "train"))
    tea_path = ckpt.latest_checkpoint(
        os.path.join(ws_t, "checkpoints"), "hash")

    ws = str(tmp_path_factory.mktemp("ws_dis_vm"))
    cfg = _cfg(
        scene, ws, model_type="vm", teacher_type="hash", iters=20,
        stage1_iters=0, stage2_iters=0, num_rays=128,
        resolution0=16, resolution1=24, upsample_model_steps=(10,),
    )
    from pvd_tpu.cli.common import upsample_schedule

    tr = Trainer(cfg, mode="distill")
    tr.upsample_resolutions = upsample_schedule(cfg)
    assert tr.upsample_resolutions == [24]
    tr.load_teacher(tea_path)
    res_before = tr.vm_resolution
    tr.train(NeRFDataset(cfg, "train"))
    # resolution changed and params match it
    assert tr.vm_resolution != res_before
    m0 = tr.state.params["sigma_mat"][0]
    v0 = tr.state.params["sigma_vec"][0]
    assert (m0.shape[1], m0.shape[0], v0.shape[0]) == tuple(tr.vm_resolution)
    # per-axis resolutions derive from the shrunk aabb: equal-volume voxels
    aabb = np.asarray(tr.state.occ.aabb_train)
    size = aabb[3:] - aabb[:3]
    vox = float(np.cbrt(np.prod(size) / 24.0 ** 3))
    expect = tuple(int(v) for v in (size / vox).astype(np.int64))
    assert tuple(tr.vm_resolution) == expect


def test_scan_steps_fused_distill(scene, tmp_path_factory):
    """cfg.scan_steps fuses K distill steps into one lax.scan dispatch.

    The fused run must execute exactly `iters` optimizer steps, produce
    finite improving losses, and fall back to single dispatches around
    stage boundaries (stage1_iters=6 is NOT a multiple of K=4, so the
    chunker must single-step across it)."""
    ws_t = str(tmp_path_factory.mktemp("ws_tea_scan"))
    cfg_t = _cfg(scene, ws_t, model_type="hash", iters=30)
    tea = Trainer(cfg_t, mode="teacher")
    tea.train(NeRFDataset(cfg_t, "train"))
    tea_path = ckpt.latest_checkpoint(
        os.path.join(ws_t, "checkpoints"), "hash")

    ws = str(tmp_path_factory.mktemp("ws_dis_scan"))
    cfg = _cfg(scene, ws, model_type="vm", teacher_type="hash", iters=20,
               stage1_iters=6, stage2_iters=10, resolution0=24,
               scan_steps=4, num_rays=128)
    tr = Trainer(cfg, mode="distill")
    tr.load_teacher(tea_path)
    tr.train(NeRFDataset(cfg, "train"))
    assert int(tr.state.step) == 20
    # the scan step-fn cache was actually used for stage 3 (8 of the 20
    # steps are scan-eligible: 12..15 and 16..19)
    assert any(k[0] == "scan" for k in tr._steps), list(tr._steps)
    assert np.isfinite(float(tr._last_metrics["loss"]))
    tr.close()
    tea.close()


def test_wall_budget_ends_training_gracefully(scene, tmp_path_factory):
    """cfg.wall_budget must end the run early AT AN EPOCH BOUNDARY with the
    normal final checkpoint + eval (shared-TPU safety: a training process is
    never killed; it must finish on its own).  wall_budget=tiny -> the first
    epoch boundary becomes the end of training."""
    ws = str(tmp_path_factory.mktemp("ws_wallb"))
    cfg = _cfg(scene, ws, model_type="hash", iters=10_000, eval_interval=999,
               wall_budget=1e-3)
    tr = Trainer(cfg, mode="teacher")
    train_ds = NeRFDataset(cfg, "train")
    valid_ds = NeRFDataset(cfg, "val")
    tr.train(train_ds, valid_ds=valid_ds)
    step = int(tr.state.step)
    # stopped at the first epoch boundary, far short of cfg.iters
    assert 0 < step <= len(train_ds.poses)
    # final save + eval still ran (best ckpt tracked despite interval 999)
    assert os.path.exists(os.path.join(ws, "checkpoints", "hash_best.ckpt"))
    assert tr.best_psnr > 0
    tr.close()


def test_scan_steps_fused_teacher(scene, tmp_path_factory):
    """cfg.scan_steps also fuses TEACHER steps (GT pixels come from one flat
    gather over the device-resident image stack inside the lax.scan body).
    The fused run must execute exactly `iters` optimizer steps with finite
    metrics, single-stepping across occupancy-update ticks (iv=16 with K=4
    leaves steps 0..15 eligible in chunks of 4, etc.)."""
    ws = str(tmp_path_factory.mktemp("ws_tea_scanfuse"))
    cfg = _cfg(scene, ws, model_type="hash", iters=40, scan_steps=4,
               num_rays=128)
    tr = Trainer(cfg, mode="teacher")
    tr.train(NeRFDataset(cfg, "train"))
    assert int(tr.state.step) == 40
    assert any(k[0] == "scan_tea" for k in tr._steps), list(tr._steps)
    assert np.isfinite(float(tr._last_metrics["loss"]))
    stats = tr.evaluate(NeRFDataset(cfg, "test"))
    assert np.isfinite(stats["psnr"]) and stats["psnr"] > 10.0
    tr.close()


def test_plenoxel_upsample_wired_in_distill(scene, tmp_path_factory):
    """--upsample_model_steps on a 'tensors' student runs the plenoxel
    coarse-to-fine path (round 5): the dense volume starts at
    resolution0^3 and trilinear-upsamples to the scheduled target
    (no shrink — the reference never shrinks plenoxels)."""
    ws_t = str(tmp_path_factory.mktemp("ws_tea_px"))
    cfg_t = _cfg(scene, ws_t, model_type="hash", iters=30)
    tea = Trainer(cfg_t, mode="teacher")
    tea.train(NeRFDataset(cfg_t, "train"))
    tea_path = ckpt.latest_checkpoint(
        os.path.join(ws_t, "checkpoints"), "hash")

    ws = str(tmp_path_factory.mktemp("ws_dis_px"))
    cfg = _cfg(
        scene, ws, model_type="tensors", teacher_type="hash", iters=20,
        stage1_iters=0, stage2_iters=0, num_rays=128,
        resolution0=16, resolution1=24, upsample_model_steps=(10,),
    )
    from pvd_tpu.cli.common import upsample_schedule

    tr = Trainer(cfg, mode="distill")
    tr.upsample_resolutions = upsample_schedule(cfg)
    assert tr.upsample_resolutions == [24]
    tr.load_teacher(tea_path)
    # coarse start: the volume inits at resolution0^3, not plenoxel_res
    assert tr.state.params["volume"].shape[:3] == (16, 16, 16)
    tr.train(NeRFDataset(cfg, "train"))
    assert int(tr.state.step) == 20
    assert tr.state.params["volume"].shape[:3] == (24, 24, 24)
    assert np.isfinite(np.asarray(tr.state.params["volume"])).all()
    tr.close()
    tea.close()
