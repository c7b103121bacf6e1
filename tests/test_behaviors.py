"""Behavior tests: hierarchical upsampling, fix_mlp freezing, VM resize
schedule — reference behaviors not covered elsewhere."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pvd_tpu.config import ModelSpec, PVDConfig, RenderSpec
from pvd_tpu.data.provider import NeRFDataset
from pvd_tpu.data.synth import make_synthetic_scene
from pvd_tpu.engine.trainer import Trainer
from pvd_tpu.models import init_field
from pvd_tpu.render.renderer import render_stratified


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bhv_scene"))
    make_synthetic_scene(root, n_train=6, n_val=1, n_test=1, H=32, W=32)
    return root


def test_stratified_upsample_path():
    """renderer.py:200-255: inverse-CDF importance resampling branch."""
    spec = ModelSpec(model_type="hash", hash_num_levels=4, hash_desired_res=64)
    params = init_field(jax.random.PRNGKey(0), spec)
    rspec = RenderSpec(bound=1.0, grid_size=16, num_steps=32,
                       upsample_steps=16)
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    o = jnp.array([[0.0, 0, -2.0], [0.1, 0.1, -2.0]])
    d = jnp.array([[0.0, 0, 1.0], [0.0, 0, 1.0]])
    out = render_stratified(params, spec, rspec, aabb, o, d,
                            rng=jax.random.PRNGKey(1), perturb=True)
    assert out["image"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["image"])).all()
    # deterministic (no rng) path as well
    out2 = render_stratified(params, spec, rspec, aabb, o, d)
    assert np.isfinite(np.asarray(out2["image"])).all()


def _tiny_cfg(scene, ws, **kw):
    base = dict(
        path=scene, workspace=ws, num_rays=128, grid_size=16, max_steps=64,
        max_samples=24, update_extra_interval=8, max_ray_batch=1024,
        density_thresh=0.01, seed=0, resolution0=12, resolution1=16,
        nerf_layer_num=4, nerf_layer_wide=32, PE=4, skip=1,
    )
    base.update(kw)
    return PVDConfig(**base)


def test_fix_mlp_freezes_heads(scene, tmp_path_factory):
    """fix_mlp distillation trains the encoder but not sigma/color nets
    (main_distill_mutual.py:322-332)."""
    ws_t = str(tmp_path_factory.mktemp("fx_t"))
    cfg_t = _tiny_cfg(scene, ws_t, model_type="hash", iters=16)
    tr_t = Trainer(cfg_t, mode="teacher")
    tr_t.train(NeRFDataset(cfg_t, "train"))
    tea = tr_t.save()

    ws = str(tmp_path_factory.mktemp("fx_s"))
    cfg = _tiny_cfg(scene, ws, model_type="hash", teacher_type="hash",
                    iters=12, stage1_iters=0, stage2_iters=4,
                    distill_mode="fix_mlp")
    tr = Trainer(cfg, mode="distill")
    tr.load_teacher(tea)
    before = jax.tree_util.tree_map(np.asarray, tr.state.params)
    tr.train(NeRFDataset(cfg, "train"))
    after = tr.state.params
    # heads frozen exactly
    for head in ("sigma_net", "color_net"):
        for b, a in zip(before[head], after[head]):
            np.testing.assert_array_equal(b["w"], np.asarray(a["w"]))
    # encoder trained
    assert float(jnp.sum(jnp.abs(after["encoder"]
                                 - jnp.asarray(before["encoder"])))) > 0


def test_vm_upsample_schedule_in_training(scene, tmp_path_factory):
    """Scheduled shrink+upsample changes VM resolution mid-training and the
    optimizer state is rebuilt (utils.py:682-704)."""
    ws = str(tmp_path_factory.mktemp("vmres"))
    cfg = _tiny_cfg(scene, ws, model_type="vm", iters=30,
                    upsample_model_steps=(10,))
    trainer = Trainer(cfg, mode="teacher")
    trainer.upsample_resolutions = [16]
    trainer.train(NeRFDataset(cfg, "train"))
    assert trainer.vm_resolution == (16, 16, 16)
    assert trainer.state.params["sigma_mat"][0].shape[-1] == 16  # rank kept
    assert trainer.state.params["sigma_vec"][0].shape[0] == 16  # new res
    assert int(trainer.state.step) == 30  # training continued after resize
