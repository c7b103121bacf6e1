"""Any-to-any distillation smoke matrix (BASELINE config 5 scope).

All 4 architectures act as teacher and as student: the FULL 16-pair
matrix executes (reference scope: main_distill_mutual.py:43-236
teacher_type x model_type), each pair for a handful of steps at the tiny
config, asserting step count and finite test PSNR.  The 4 teachers train
once (module fixture) and are shared across their 4 student runs."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from pvd_tpu.config import PVDConfig
from pvd_tpu.data.provider import NeRFDataset
from pvd_tpu.data.synth import make_synthetic_scene
from pvd_tpu.engine.trainer import Trainer

ARCHS = ["hash", "mlp", "vm", "tensors"]
PAIRS = list(itertools.product(ARCHS, ARCHS))


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("matrix_scene"))
    make_synthetic_scene(root, n_train=6, n_val=1, n_test=1, H=32, W=32)
    return root


def _cfg(scene, ws, **kw):
    base = dict(
        path=scene, workspace=ws, num_rays=128, grid_size=16, max_steps=64,
        max_samples=24, update_extra_interval=8, max_ray_batch=1024,
        density_thresh=0.01, seed=0,
        resolution0=12, resolution1=12, plenoxel_res=(12, 12, 12),
        nerf_layer_num=4, nerf_layer_wide=32, PE=4, skip=1,
    )
    base.update(kw)
    return PVDConfig(**base)


@pytest.mark.parametrize("data_type", ["llff", "tank"])
def test_distill_llff_tank_through_cli(scene, tmp_path_factory, data_type):
    """LLFF/tank-type distillation end to end THROUGH THE CLI (VERDICT #7):
    per-epoch random poses come from the camera-bbox (llff) / radius-
    randomized orbit (tank) samplers instead of the synthetic sphere."""
    from pvd_tpu.cli import distill as distill_cli
    from pvd_tpu.cli import train_teacher as teacher_cli

    ws_t = str(tmp_path_factory.mktemp(f"cli_tea_{data_type}"))
    teacher_cli.main([
        scene, "--workspace", ws_t, "--model_type", "hash",
        "--iters", "16", "--num_rays", "128", "--grid_size", "16",
        "--max_steps", "64", "--max_samples", "24", "--density_thresh",
        "0.01", "--eval_interval", "1000",
    ])
    import glob

    ckpts = sorted(glob.glob(ws_t + "*/checkpoints/*.ckpt"))
    assert ckpts, ws_t

    ws_s = str(tmp_path_factory.mktemp(f"cli_dis_{data_type}"))
    distill_cli.main([
        scene, "--workspace", ws_s, "--teacher_type", "hash",
        "--model_type", "vm", "--ckpt_teacher", ckpts[-1],
        "--data_type", data_type, "--iters", "12",
        "--stage_iters", "{'stage1':4,'stage2':8}",
        "--num_rays", "128", "--grid_size", "16", "--max_steps", "64",
        "--max_samples", "24", "--resolution0", "12",
        "--eval_interval", "1000",
    ])
    out = sorted(glob.glob(ws_s + "*/results/*.png"))
    assert out, ws_s  # eval artifacts written


@pytest.fixture(scope="module")
def teacher_ckpts(scene, tmp_path_factory):
    """Train each architecture as a teacher once; share across pairs."""
    paths = {}
    for arch in ARCHS:
        ws_t = str(tmp_path_factory.mktemp(f"t_{arch}"))
        cfg_t = _cfg(scene, ws_t, model_type=arch, iters=24)
        tr_t = Trainer(cfg_t, mode="teacher")
        tr_t.train(NeRFDataset(cfg_t, "train"))
        paths[arch] = tr_t.save()
        tr_t.close()
    return paths


@pytest.mark.parametrize("teacher,student", PAIRS)
def test_distill_pair(scene, tmp_path_factory, teacher_ckpts, teacher,
                      student):
    tea_path = teacher_ckpts[teacher]
    ws_s = str(tmp_path_factory.mktemp(f"s_{teacher}2{student}"))
    cfg = _cfg(
        scene, ws_s, model_type=student, teacher_type=teacher,
        iters=18, stage1_iters=6, stage2_iters=12,
    )
    if "tensors" in (teacher, student):
        cfg.stage1_iters = 0
    tr = Trainer(cfg, mode="distill")
    tr.load_teacher(tea_path)
    tr.train(NeRFDataset(cfg, "train"))
    assert int(tr.state.step) == 18

    test_ds = NeRFDataset(cfg, "test")
    stats = tr.evaluate(test_ds)
    assert np.isfinite(stats["psnr"]), (teacher, student, stats)
