"""Data-parallel train steps over the ray axis.

Design (jax-ml scaling-book recipe): place the ray batch with a
NamedSharding over the 'rays' mesh axis and the parameters/optimizer state
replicated; jit the same pure step used single-chip and let XLA insert the
gradient all-reduce over ICI.  The per-ray pipeline (lattice marching,
field query, compositing) never communicates, so the only collective is the
psum of the (small, replicated) parameter gradients — this replaces the
reference's dormant torch.distributed all_reduce hooks
(distill_mutual/utils.py:1243-1265).

Ray sampling moves OUT of the step (vs the single-chip step in
engine/train_steps.py) so the batch can be sharded explicitly; the pixel
gather happens on-host (or upstream) and each device receives its slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from pvd_tpu.config import ModelSpec, PVDConfig, RenderSpec
from pvd_tpu.engine.train_steps import TrainState, masked_loss, rgb_loss
from pvd_tpu.models import vm_density_l1
from pvd_tpu.parallel.mesh import ray_sharding, replicated_sharding
from pvd_tpu.render.renderer import render_rays


def make_dp_teacher_step(
    spec: ModelSpec,
    rspec: RenderSpec,
    opt: optax.GradientTransformation,
    cfg: PVDConfig,
    mesh: Mesh,
):
    """step(state, rays_o [N,3], rays_d [N,3], gt [N,3], bg [N,3], key).

    Inputs with a leading ray axis should be placed with ray_sharding(mesh);
    state replicated (parallel.mesh.replicate).
    """
    rs = ray_sharding(mesh)
    rep = replicated_sharding(mesh)

    def loss_fn(params, occ, o, d, gt, bg, key):
        out = render_rays(
            params, spec, rspec, occ, o, d, training=True, bg_color=bg,
            perturb_key=key,
        )
        loss = rgb_loss(out["image"], gt, cfg.loss_type)
        if spec.model_type == "vm" and cfg.l1_reg_weight > 0:
            loss = loss + cfg.l1_reg_weight * vm_density_l1(params)
        return loss, out

    @jax.jit
    def step(state: TrainState, o, d, gt, bg, key):
        o = jax.lax.with_sharding_constraint(o, rs)
        d = jax.lax.with_sharding_constraint(d, rs)
        gt = jax.lax.with_sharding_constraint(gt, rs)
        bg = jax.lax.with_sharding_constraint(bg, rs)
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.occ, o, d, gt, bg, key
        )
        grads = jax.lax.with_sharding_constraint(grads, rep)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log10(jnp.mean((out["image"] - gt) ** 2) + 1e-12),
        }
        return (
            state.replace(params=params, opt_state=opt_state,
                          step=state.step + 1),
            metrics,
        )

    return step


def make_dp_distill_step(
    spec_stu: ModelSpec,
    spec_tea: ModelSpec,
    rspec: RenderSpec,
    opt: optax.GradientTransformation,
    cfg: PVDConfig,
    mesh: Mesh,
    stage: int = 3,
):
    """Data-parallel distillation step (stage static), rays sharded.

    step(state, params_tea, occ_tea, o [N,3], d [N,3], bg [N,3], key).
    The student marches; the teacher inherits the student's samples, so the
    teacher pass shards identically with zero extra communication.
    """
    rs = ray_sharding(mesh)
    rep = replicated_sharding(mesh)
    both_have_fea = "tensors" not in (spec_stu.model_type, spec_tea.model_type)
    want_color = stage >= 2
    composite = stage == 3

    def loss_fn(params_stu, params_tea, occ, occ_tea, o, d, bg, key, step_i):
        out_s = render_rays(
            params_stu, spec_stu, rspec, occ, o, d, training=True,
            bg_color=bg, perturb_key=key, want_color=want_color,
            composite=composite,
        )
        out_t = jax.lax.stop_gradient(
            render_rays(
                params_tea, spec_tea, rspec, occ_tea, o, d, training=True,
                bg_color=bg, want_color=want_color, composite=composite,
                inherited=out_s["samples"],
            )
        )
        mask = out_s["samples"].mask
        rate_fea = cfg.loss_rate_fea_sc * 0.995 ** step_i.astype(jnp.float32)
        loss = 0.0
        if both_have_fea and stage >= 1:
            loss = loss + rate_fea * masked_loss(
                out_s["fea_sc"], out_t["fea_sc"], mask, cfg.loss_type
            )
        if stage >= 2:
            loss = loss + cfg.loss_rate_sigma * masked_loss(
                out_s["sigma_logit"], out_t["sigma_logit"], mask, cfg.loss_type
            )
            loss = loss + cfg.loss_rate_color * masked_loss(
                out_s["rgb_l"], out_t["rgb_l"], mask, cfg.loss_type
            )
        if stage == 3:
            loss = loss + cfg.loss_rate_rgb * rgb_loss(
                out_s["image"], out_t["image"], cfg.loss_type
            )
            if spec_stu.model_type == "vm" and cfg.l1_reg_weight > 0:
                loss = loss + cfg.l1_reg_weight * vm_density_l1(params_stu)
        return loss

    @jax.jit
    def step(state: TrainState, params_tea, occ_tea, o, d, bg, key):
        o = jax.lax.with_sharding_constraint(o, rs)
        d = jax.lax.with_sharding_constraint(d, rs)
        bg = jax.lax.with_sharding_constraint(bg, rs)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, params_tea, state.occ, occ_tea, o, d, bg, key,
            state.step,
        )
        grads = jax.lax.with_sharding_constraint(grads, rep)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state,
                          step=state.step + 1),
            {"loss": loss},
        )

    return step
