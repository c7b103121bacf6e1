"""Jitted training-step builders (teacher + distillation) and helpers.

Teacher step = reference Trainer.train_step (just_train_tea/utils.py:746-846):
sample pixels on device, composite GT against a per-pixel random background
when the image has alpha, render with perturbed marching, MSE (+ VM L1 reg).

Distill step = distill_mutual/utils.py:954-1189: student renders first with
its own occupancy grid; the teacher replays the student's exact samples under
stop_gradient; the 3-stage loss aligns features, then point sigma/color
logits, then rendered RGB — with the feature-loss rate decaying 0.995^step.

Everything here is a pure function of (state, batch, rng) so the whole step
jits once per stage and runs on-device end to end (the reference's per-step
host work — loss.item(), step counters — has no equivalent).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pvd_tpu.config import ModelSpec, PVDConfig, RenderSpec
from pvd_tpu.models import field_density, vm_density_l1
from pvd_tpu.ops.rays import get_rays
from pvd_tpu.render import update_density_grid
from pvd_tpu.render.occupancy import OccupancyState
from pvd_tpu.render.renderer import render_rays


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    occ: OccupancyState
    step: jnp.ndarray  # scalar i32
    ema_params: Optional[Any] = None


def masked_loss(pred, gt, mask, loss_type: str):
    """Point losses over valid (unpadded) samples only.

    The reference computes these over ragged valid points
    (distill_mutual/utils.py:941-952 get_loss); here padded slots are
    excluded by the mask.  pred/gt: [..., C] or [...]; mask broadcastable.
    """
    diff = pred - gt
    if diff.ndim > mask.ndim:
        mask = mask[..., None]
    m = mask.astype(diff.dtype)
    diff = diff * m
    n_valid = jnp.maximum(jnp.sum(jnp.broadcast_to(m, diff.shape)), 1.0)
    if loss_type == "L2":
        return jnp.sum(diff**2) / n_valid
    if loss_type == "normL2":
        return jnp.sqrt(jnp.sum(diff**2) + 1e-12)
    if loss_type == "normL1":
        return jnp.sum(jnp.abs(diff))
    if loss_type == "smoothL1":
        beta = 0.05
        a = jnp.abs(diff)
        v = jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)
        return jnp.sum(v) / n_valid
    raise ValueError(f"unknown loss_type {loss_type}")


def rgb_loss(pred, gt, loss_type: str):
    if loss_type == "L2":
        return jnp.mean((pred - gt) ** 2)
    if loss_type == "normL2":
        return jnp.sqrt(jnp.sum((pred - gt) ** 2) + 1e-12)
    if loss_type == "normL1":
        return jnp.sum(jnp.abs(pred - gt))
    if loss_type == "smoothL1":
        beta = 0.05
        a = jnp.abs(pred - gt)
        return jnp.mean(jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta))
    raise ValueError(f"unknown loss_type {loss_type}")


def compose_gt(pix, image_channels: int, bg_radius: float, k_bg):
    """GT pixel compositing for teacher training (just_train_tea/
    utils.py:777-787): every RGBA image composites rgb*a + bg*(1-a), with a
    white bg when a background model exists (bg_radius > 0) and a per-pixel
    random bg otherwise.  Returns (gt [N,3], bg — scalar or [N,3] — to pass
    to the renderer)."""
    if image_channels == 4:
        bg = (1.0 if bg_radius > 0
              else jax.random.uniform(k_bg, (pix.shape[0], 3)))
        gt = pix[..., :3] * pix[..., 3:] + jnp.asarray(bg) * (
            1.0 - pix[..., 3:])
    else:
        bg = 1.0
        gt = pix[..., :3]
    return gt, bg


def teacher_loss(params, spec: ModelSpec, rspec: RenderSpec, cfg: PVDConfig,
                 occ, o, d, gt, bg, key):
    """Single source of truth for the teacher objective — used verbatim by
    the single-chip step and the shard_map data-parallel step, so DP-vs-
    single equivalence is structural."""
    out = render_rays(
        params, spec, rspec, occ, o, d, training=True,
        bg_color=bg, perturb_key=key,
    )
    per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)  # [N]
    if cfg.loss_type == "L2":
        loss = jnp.mean(per_ray)
    else:
        loss = rgb_loss(out["image"], gt, cfg.loss_type)
    if spec.model_type == "vm" and cfg.l1_reg_weight > 0:
        loss = loss + cfg.l1_reg_weight * vm_density_l1(params)
    return loss, (out, per_ray)


def distill_loss(params_stu, params_tea, spec_stu: ModelSpec,
                 spec_tea: ModelSpec, rspec: RenderSpec, cfg: PVDConfig,
                 stage: int, occ, occ_tea, o, d, bg, key, step):
    """Single source of truth for the 3-stage distillation objective
    (distill_mutual/utils.py:954-1189) — shared by the single-chip and
    shard_map DP steps."""
    both_have_fea = "tensors" not in (spec_stu.model_type,
                                      spec_tea.model_type)
    want_color = stage >= 2
    composite = stage == 3

    out_s = render_rays(
        params_stu, spec_stu, rspec, occ, o, d, training=True,
        bg_color=bg, perturb_key=key, want_color=want_color,
        composite=composite,
    )
    out_t = render_rays(
        params_tea, spec_tea, rspec, occ_tea, o, d, training=True,
        bg_color=bg, want_color=want_color, composite=composite,
        inherited=out_s["samples"],
        inherited_compact=out_s["compact"],
        inherited_t_c=out_s.get("compact_t"),
    )
    out_t = jax.lax.stop_gradient(out_t)
    # [N, S] padded mask, or the [M] compacted-slot mask when the global
    # sample budget is on — point tensors match either way
    mask = out_s["mask"]

    # feature-loss rate decays x0.995 per step (utils.py:41-42, 1044)
    rate_fea = cfg.loss_rate_fea_sc * 0.995 ** step.astype(jnp.float32)

    loss = 0.0
    logs = {
        "budget_hit": out_s["budget_hit_frac"],
        "mask_frac": out_s["mask_frac"],
    }
    if "compact_frac" in out_s:
        logs["compact_frac"] = out_s["compact_frac"]
    if both_have_fea:
        l_fea = masked_loss(out_s["fea_sc"], out_t["fea_sc"], mask,
                            cfg.loss_type)
        loss = loss + rate_fea * l_fea
        logs["loss_fea_sc"] = l_fea
    else:
        logs["loss_fea_sc"] = jnp.float32(0.0)

    if stage >= 2:
        l_sigma = masked_loss(out_s["sigma_logit"], out_t["sigma_logit"],
                              mask, cfg.loss_type)
        l_color = masked_loss(out_s["rgb_l"], out_t["rgb_l"], mask,
                              cfg.loss_type)
        loss = loss + cfg.loss_rate_sigma * l_sigma
        loss = loss + cfg.loss_rate_color * l_color
        logs["loss_sigma"] = l_sigma
        logs["loss_color"] = l_color

    per_ray = None
    if stage == 3:
        l_rgb = rgb_loss(out_s["image"], out_t["image"], cfg.loss_type)
        per_ray = jnp.mean((out_s["image"] - out_t["image"]) ** 2, axis=-1)
        loss = loss + cfg.loss_rate_rgb * l_rgb
        if spec_stu.model_type == "vm" and cfg.l1_reg_weight > 0:
            loss = loss + cfg.l1_reg_weight * vm_density_l1(params_stu)
        logs["loss_rgb"] = l_rgb
        logs["psnr"] = -10.0 * jnp.log10(
            jnp.mean((out_s["image"] - out_t["image"]) ** 2) + 1e-12
        )

    logs["loss"] = loss
    return loss, (logs, per_ray)


def make_teacher_step(
    spec: ModelSpec,
    rspec: RenderSpec,
    opt: optax.GradientTransformation,
    cfg: PVDConfig,
    intrinsics,
    H: int,
    W: int,
    image_channels: int,
    ema_decay: float = -1.0,
    use_error_map: bool = False,
    scan_steps: int = 0,
):
    """Returns jitted step(state, pose [4,4], image_flat [H*W, C], emap, key).

    `emap` is this image's [128*128] error-map row when use_error_map (the
    importance ray sampler + EMA error update, get_rays/utils.py:353-381 and
    the loss-side update at utils.py:1125-1133); pass None otherwise — the
    returned emap is the updated row (or None).

    scan_steps > 0 returns instead a DEVICE-RESIDENT multi-step:
    step(state, images_flat [B, H*W, C], idxs [K] i32, poses [K,4,4], key)
    -> (state, logs stacked [K]) running K optimizer steps in one lax.scan
    dispatch — same amortization as the distill scan (per-call host/tunnel
    overhead ~1.2 ms measured on v5e-via-axon).  GT pixels come from ONE
    flat gather over the device-resident image stack per step (no per-step
    H*W dynamic-slice).  With use_error_map the signature gains the full
    device-resident map: step(state, images_flat, idxs, poses,
    emap_all [B, 128*128], key) -> (state, emap_all, logs): the map rides
    the scan CARRY, so step j's importance draw sees step j-1's EMA cell
    update even when both hit the same image (utils.py:353-381, 1125-1133).

    RNG contract: every flavor derives step j's key as
    fold_in(caller_key, state.step at j), so K fused steps with a constant
    caller key reproduce K single steps BITWISE (test_trainer_features).
    """
    intr = tuple(float(v) for v in intrinsics)

    def loss_fn(params, occ, rays_o, rays_d, gt, bg, key):
        return teacher_loss(params, spec, rspec, cfg, occ, rays_o, rays_d,
                            gt, bg, key)

    def _core(state: TrainState, o, d, pix, k_bg, k_perturb):
        if cfg.color_space == "linear":
            from pvd_tpu.utils.misc import srgb_to_linear

            pix = jnp.concatenate(
                [srgb_to_linear(pix[..., :3]), pix[..., 3:]], axis=-1
            )
        gt, bg = compose_gt(pix, image_channels, spec.bg_radius, k_bg)
        (loss, (out, per_ray)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.occ, o, d, gt, bg, k_perturb)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            from pvd_tpu.engine.optim import ema_update

            ema = ema_update(ema, params, ema_decay)
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log10(
                jnp.mean((out["image"] - gt) ** 2) + 1e-12),
            "budget_hit": out["budget_hit_frac"],
            "mask_frac": out["mask_frac"],
        }
        if "compact_frac" in out:
            metrics["compact_frac"] = out["compact_frac"]
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1, ema_params=ema)
        return new_state, metrics, per_ray

    if scan_steps > 0:
        # NOTE: no donate_argnums — buffer donation through the axon
        # tunnel raises TPU InvalidArgument at execution time
        EC = 128 * 128  # coarse error-map cells per image (utils.py:353)

        def _scan_core(state: TrainState, images_flat, idxs, poses,
                       emap_all, key):
            HW = H * W
            C = images_flat.shape[-1]
            pixels = images_flat.reshape(-1, C)  # [B*HW, C] major split

            def body(carry, inp):
                st, em = carry
                pose_i, idx_i = inp
                # fold the live step counter so K fused steps == K single
                # steps under a constant caller key (single step below)
                k = jax.random.fold_in(key, st.step)
                k_rays, k_bg, k_perturb = jax.random.split(k, 3)
                row = (jax.lax.dynamic_slice(em, (idx_i, 0), (1, EC))
                       if use_error_map else None)
                rays = get_rays(k_rays, pose_i[None], intr, H, W,
                                cfg.num_rays, error_map=row)
                pix = pixels[idx_i * HW + rays["inds"][0]]  # flat 1-D gather
                st, metrics, per_ray = _core(st, rays["rays_o"][0],
                                             rays["rays_d"][0], pix, k_bg,
                                             k_perturb)
                if use_error_map:
                    # EMA cell update in the carry (utils.py:1125-1133);
                    # flat 1-D scatter (2-D scatters are slower on the v5e
                    # scatter engine, see CLAUDE.md platform facts)
                    coarse = rays["inds_coarse"][0]
                    upd = (0.1 * row[0, coarse]
                           + 0.9 * jax.lax.stop_gradient(per_ray))
                    em = (em.reshape(-1).at[idx_i * EC + coarse].set(upd)
                          .reshape(em.shape))
                return (st, em), metrics

            (state, emap_all), logs = jax.lax.scan(
                body, (state, emap_all), (poses, idxs))
            return state, emap_all, logs

        if use_error_map:
            @jax.jit
            def step_scan_emap(state, images_flat, idxs, poses, emap_all,
                               key):
                return _scan_core(state, images_flat, idxs, poses, emap_all,
                                  key)

            return step_scan_emap

        @jax.jit
        def step_scan(state: TrainState, images_flat, idxs, poses, key):
            st, _, logs = _scan_core(state, images_flat, idxs, poses,
                                     jnp.zeros((1, EC), jnp.float32), key)
            return st, logs

        return step_scan

    @jax.jit
    def step(state: TrainState, pose, image_flat, emap, key):
        key = jax.random.fold_in(key, state.step)  # constant-key callers ok
        k_rays, k_bg, k_perturb = jax.random.split(key, 3)
        rays = get_rays(
            k_rays, pose[None], intr, H, W, cfg.num_rays,
            error_map=emap[None] if use_error_map else None,
        )
        pix = image_flat[rays["inds"][0]]  # [N, C]
        new_state, metrics, per_ray = _core(
            state, rays["rays_o"][0], rays["rays_d"][0], pix, k_bg, k_perturb
        )
        new_emap = emap
        if use_error_map:
            # EMA update of the coarse error cells hit this step
            # (distill_mutual/utils.py:1125-1133)
            coarse = rays["inds_coarse"][0]
            old = emap[coarse]
            new_emap = emap.at[coarse].set(
                0.1 * old + 0.9 * jax.lax.stop_gradient(per_ray)
            )
        return new_state, new_emap, metrics

    return step


def make_teacher_step_host(
    spec: ModelSpec,
    rspec: RenderSpec,
    opt: optax.GradientTransformation,
    cfg: PVDConfig,
    intrinsics,
    H: int,
    W: int,
    image_channels: int,
    ema_decay: float = -1.0,
    use_error_map: bool = False,
    scan_steps: int = 0,
):
    """Teacher step fed by host-side batches (preload=False path).

    step(state, pose [4,4], inds [N] i32, pix [N,C], key): pixel indices
    and GT pixels come from the native RayBatcher (data/raybatch.py)
    instead of an on-device gather over device-resident images.

    With use_error_map the importance DRAW happens on the host (it selects
    which pixels the host gathers: ops/rays.draw_error_map_inds_np), so
    the step instead returns (state, per_ray [N] stop-gradient losses,
    metrics) and the caller applies the reference's 0.1/0.9 EMA cell
    update (distill_mutual/utils.py:1125-1133) to its host-resident map.

    scan_steps > 0 returns instead step(state, poses [K,4,4],
    inds [K,N], pix [K,N,C], key) -> (state, per_ray [K,N], logs [K])
    running K optimizer steps in one lax.scan dispatch — the host draws
    all K batches up front (with use_error_map, from the map as of chunk
    start: the EMA cell lag grows from the single-step path's 1 step to
    at most K; the map is a heavily-smoothed 0.1/0.9 EMA over 16K cells,
    so a K=8 lag is a negligible sampler perturbation) and applies the K
    returned per-ray loss rows to its host map in step order.  RNG
    contract matches every other scan flavor: step j's key is
    fold_in(caller_key, state.step at j), so K fused steps with a
    constant caller key reproduce K single host steps bitwise.
    """
    from pvd_tpu.ops.rays import pixel_dirs

    intr = tuple(float(v) for v in intrinsics)

    def loss_fn(params, occ, rays_o, rays_d, gt, bg, key):
        loss, (out, per_ray) = teacher_loss(params, spec, rspec, cfg, occ,
                                            rays_o, rays_d, gt, bg, key)
        return loss, (out, per_ray)

    def _core(state: TrainState, pose, inds, pix, key):
        key = jax.random.fold_in(key, state.step)  # constant-key callers ok
        k_bg, k_perturb = jax.random.split(key)
        dirs_cam = pixel_dirs(intr, inds, H, W)
        d = dirs_cam @ pose[:3, :3].T
        o = jnp.broadcast_to(pose[:3, 3], d.shape)
        if cfg.color_space == "linear":
            from pvd_tpu.utils.misc import srgb_to_linear

            pix = jnp.concatenate(
                [srgb_to_linear(pix[..., :3]), pix[..., 3:]], axis=-1
            )
        gt, bg = compose_gt(pix, image_channels, spec.bg_radius, k_bg)
        (loss, (out, per_ray)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.occ, o, d, gt, bg, k_perturb)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            from pvd_tpu.engine.optim import ema_update

            ema = ema_update(ema, params, ema_decay)
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log10(jnp.mean((out["image"] - gt) ** 2) + 1e-12),
            "budget_hit": out["budget_hit_frac"],
            "mask_frac": out["mask_frac"],
        }
        if "compact_frac" in out:
            metrics["compact_frac"] = out["compact_frac"]
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1, ema_params=ema)
        return new_state, jax.lax.stop_gradient(per_ray), metrics

    if scan_steps > 0:
        # NOTE: no donate_argnums (axon buffer-donation limitation)
        @jax.jit
        def step_scan_host(state: TrainState, poses, inds_k, pix_k, key):
            def body(st, inp):
                pose_i, inds_i, pix_i = inp
                st, per_ray, metrics = _core(st, pose_i, inds_i, pix_i, key)
                return st, (per_ray, metrics)

            state, (per_rays, logs) = jax.lax.scan(
                body, state, (poses, inds_k, pix_k))
            return state, per_rays, logs

        return step_scan_host

    @jax.jit
    def step(state: TrainState, pose, inds, pix, key):
        new_state, per_ray, metrics = _core(state, pose, inds, pix, key)
        if use_error_map:
            return new_state, per_ray, metrics
        return new_state, metrics

    return step


def make_distill_step(
    spec_stu: ModelSpec,
    spec_tea: ModelSpec,
    rspec: RenderSpec,
    opt: optax.GradientTransformation,
    cfg: PVDConfig,
    intrinsics,
    H: int,
    W: int,
    stage: int,
    ema_decay: float = -1.0,
    use_error_map: bool = False,
    scan_steps: int = 0,
):
    """Returns jitted step(state, params_tea, occ_tea, pose, key) for one
    distillation stage (1: features, 2: +point sigma/color, 3: +RGB).

    scan_steps > 0 returns instead a DEVICE-RESIDENT multi-step:
    step(state, params_tea, occ_tea, poses [K,4,4], key) ->
    (state, logs stacked [K]) running K optimizer steps in one lax.scan
    dispatch, amortizing the per-call host/tunnel overhead (~1.2 ms/step
    measured on v5e-via-axon).  Combined with use_error_map it becomes
    step(state, params_tea, occ_tea, poses, idxs [K] i32,
    emap_all [B, 128*128], key) -> (state, emap_all, logs): the full map
    rides the scan carry so consecutive fused steps see each other's EMA
    cell updates.  Every scan flavor derives step j's key as
    fold_in(caller_key, state.step at j) — K fused steps with a constant
    caller key reproduce K single steps bitwise.

    Stage-1 is disabled upstream (by the CLI) when either side is 'tensors'
    (main_distill_mutual.py:243-246); both sides of stage 1/2 share the
    student's marched samples so point tensors are shape-aligned.

    With use_error_map the signature becomes
    step(state, params_tea, occ_tea, pose, emap [128*128], key) ->
    (state, new_emap, logs): rays are importance-sampled from the error map
    and — at stage 3 with L2 loss — the per-ray rgb loss EMA-updates the
    sampled coarse cells (distill_mutual/utils.py:1120-1130).
    """
    assert stage in (1, 2, 3)
    intr = tuple(float(v) for v in intrinsics)

    def loss_fn(params_stu, params_tea, occ, occ_tea, o, d, bg, key, step):
        return distill_loss(params_stu, params_tea, spec_stu, spec_tea,
                            rspec, cfg, stage, occ, occ_tea, o, d, bg, key,
                            step)

    def _core(state: TrainState, params_tea, occ_tea, o, d, key):
        k_bg, k_perturb = jax.random.split(key)
        # synthetic data always has alpha -> random background per step
        bg = jax.random.uniform(k_bg, (cfg.num_rays, 3))
        (loss, (logs, per_ray)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(
            state.params, params_tea, state.occ, occ_tea, o, d, bg,
            k_perturb, state.step,
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            from pvd_tpu.engine.optim import ema_update

            ema = ema_update(ema, params, ema_decay)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1,
            ema_params=ema,
        )
        return new_state, logs, per_ray

    if scan_steps > 0:
        # NOTE: no donate_argnums — buffer donation through the axon
        # tunnel raises TPU InvalidArgument at execution time
        EC = 128 * 128  # coarse error-map cells per pose slot

        def _scan_core(state, params_tea, occ_tea, poses, idxs, emap_all,
                       key):
            def body(carry, inp):
                st, em = carry
                pose_i, idx_i = inp
                # fold the live step counter so K fused steps == K single
                # steps under a constant caller key (step_fn below)
                k = jax.random.fold_in(key, st.step)
                k_rays, k_core = jax.random.split(k)
                row = (jax.lax.dynamic_slice(em, (idx_i, 0), (1, EC))
                       if use_error_map else None)
                rays = get_rays(k_rays, pose_i[None], intr, H, W,
                                cfg.num_rays, error_map=row)
                st, logs, per_ray = _core(st, params_tea, occ_tea,
                                          rays["rays_o"][0],
                                          rays["rays_d"][0], k_core)
                if use_error_map and stage == 3 and cfg.loss_type == "L2":
                    # EMA cell update rides the scan carry
                    # (distill_mutual/utils.py:1120-1130); flat 1-D scatter
                    coarse = rays["inds_coarse"][0]
                    upd = (0.1 * row[0, coarse]
                           + 0.9 * jax.lax.stop_gradient(per_ray))
                    em = (em.reshape(-1).at[idx_i * EC + coarse].set(upd)
                          .reshape(em.shape))
                return (st, em), logs

            (state, emap_all), logs = jax.lax.scan(
                body, (state, emap_all), (poses, idxs))
            return state, emap_all, logs

        if use_error_map:
            @jax.jit
            def step_scan_emap(state: TrainState, params_tea, occ_tea,
                               poses, idxs, emap_all, key):
                return _scan_core(state, params_tea, occ_tea, poses, idxs,
                                  emap_all, key)

            return step_scan_emap

        @jax.jit
        def step_scan(state: TrainState, params_tea, occ_tea, poses, key):
            idxs = jnp.zeros((scan_steps,), jnp.int32)
            st, _, logs = _scan_core(state, params_tea, occ_tea, poses,
                                     idxs, jnp.zeros((1, EC), jnp.float32),
                                     key)
            return st, logs

        return step_scan

    if not use_error_map:
        @jax.jit
        def step_fn(state: TrainState, params_tea, occ_tea, pose, key):
            # fold the step counter in so callers may pass a CONSTANT key
            # (a host-side split per step is an extra tiny device dispatch
            # that serializes against the step on the tunnel stream)
            key = jax.random.fold_in(key, state.step)
            k_rays, k_core = jax.random.split(key)
            rays = get_rays(k_rays, pose[None], intr, H, W, cfg.num_rays)
            new_state, logs, _ = _core(
                state, params_tea, occ_tea, rays["rays_o"][0],
                rays["rays_d"][0], k_core,
            )
            return new_state, logs

        return step_fn

    @jax.jit
    def step_fn_emap(state: TrainState, params_tea, occ_tea, pose, emap, key):
        key = jax.random.fold_in(key, state.step)  # constant-key callers ok
        k_rays, k_core = jax.random.split(key)
        rays = get_rays(k_rays, pose[None], intr, H, W, cfg.num_rays,
                        error_map=emap[None])
        new_state, logs, per_ray = _core(
            state, params_tea, occ_tea, rays["rays_o"][0], rays["rays_d"][0],
            k_core,
        )
        new_emap = emap
        if stage == 3 and cfg.loss_type == "L2":
            # EMA-update the sampled coarse cells with the per-ray rgb loss
            # (distill_mutual/utils.py:1120-1130)
            coarse = rays["inds_coarse"][0]
            old = emap[coarse]
            new_emap = emap.at[coarse].set(
                0.1 * old + 0.9 * jax.lax.stop_gradient(per_ray)
            )
        return new_state, new_emap, logs

    return step_fn_emap


def make_occ_update(spec: ModelSpec, rspec: RenderSpec):
    """Jitted occupancy-grid refresh (renderer.py:648-775)."""

    @partial(jax.jit, static_argnames=("full",))
    def occ_update(occ: OccupancyState, params, key, full: bool):
        def dens(x):
            return field_density(params, spec, x, occ.aabb_train)

        return update_density_grid(occ, dens, rspec, key, full=full)

    return occ_update


def make_eval_renderer(spec: ModelSpec, rspec: RenderSpec, chunk: int = 4096):
    """Chunked full-image inference renderer (reference render staged path,
    renderer.py:777-814 + the alive-ray inference loop it replaces).

    Ray generation happens INSIDE the jitted chunk from the scanline pixel
    offset — eager full-image ray math costs two orders of magnitude more
    than the render itself through a remote-TPU tunnel.

    Work reduction (replaces the reference's alive-ray compaction loop,
    renderer.py:450-543): eval marches the FULL trajectory
    (max_samples = max_steps, like the reference's 1024-step inference
    march — training's S_max cap never clips eval rays) and every chunk
    renders on the globally-COMPACTED sample stream at a per-chunk
    budget, so cost tracks actual occupancy, not chunk*max_steps padding.
    Budget truncation would zero a chunk's last rays, which is fine for
    SGD but an eval artifact — so each chunk returns a truncation flag,
    all chunks dispatch ASYNCHRONOUSLY and the flags are read back as ONE
    stacked array per ladder rung (the tunnel readback costs ~30 ms flat),
    and truncated chunks re-render on an escalating 1x/4x/16x budget
    ladder.  Chunks still truncated at the last rung are accepted but
    counted and warned about (should not happen on real grids)."""
    import dataclasses as _dc
    from functools import partial as _partial

    from pvd_tpu.ops.rays import pixel_dirs

    base_spr = rspec.samples_per_ray

    @_partial(jax.jit, static_argnames=("H", "W", "spr"))
    def render_chunk(params, occ, pose, intr, head, H, W, spr):
        if spr > 0:  # full trajectory; the budget does the work reduction
            rs = _dc.replace(rspec, samples_per_ray=spr,
                             max_samples=rspec.max_steps)
        else:
            # compaction off: still march the full trajectory so eval never
            # inherits the training S_max clip (same contract as spr>0)
            rs = _dc.replace(rspec, samples_per_ray=0.0,
                             max_samples=rspec.max_steps)
        inds = head + jnp.arange(chunk)
        inds = jnp.minimum(inds, H * W - 1)  # pad tail by repeating last px
        dirs_cam = pixel_dirs(tuple(intr), inds, H, W)
        d = dirs_cam @ pose[:3, :3].T
        o = jnp.broadcast_to(pose[:3, 3], d.shape)
        out = render_rays(
            params, spec, rs, occ, o, d, training=False, bg_color=1.0,
            early_stop=True,
        )
        truncated = (out["compact_frac"] > 1.0) if "compact_frac" in out \
            else jnp.bool_(False)
        return out["image"], out["depth"], truncated

    def render_image(params, occ, pose, intrinsics, H, W):
        import numpy as np

        pose_j = jnp.asarray(pose, jnp.float32)
        intr = tuple(float(v) for v in intrinsics)
        n = H * W
        heads = list(range(0, n, chunk))
        # budget escalation ladder; the last rung accepts its result
        # (16x the budget covers >99.9% of valid samples on real grids;
        # rays beyond that have long since early-terminated)
        ladder = ([base_spr, base_spr * 4.0, base_spr * 16.0]
                  if base_spr > 0 else [0.0])

        outs = {}
        pending = heads
        for spr in ladder:
            # dispatch every pending chunk before touching any result
            batch = [render_chunk(params, occ, pose_j, intr, jnp.int32(h),
                                  H, W, spr) for h in pending]
            # ONE host readback per rung: stack the truncation flags
            truncs = np.asarray(jnp.stack([t for (_, _, t) in batch]))
            retry = []
            for h, (img, dep, _), trunc in zip(pending, batch, truncs):
                if spr != ladder[-1] and bool(trunc):
                    retry.append(h)
                else:
                    outs[h] = (img, dep)
            pending = retry
            if not pending:
                break
        if len(ladder) > 1 and spr == ladder[-1]:
            # truncs holds the last rung's flags for its accepted chunks
            n_final_trunc = int(truncs.sum())
            if n_final_trunc:
                print(f"[eval] WARNING: {n_final_trunc} chunk(s) still "
                      "sample-budget-truncated at the final ladder rung "
                      f"(spr={spr:g}); tail rays may be zeroed", flush=True)

        imgs = [np.asarray(outs[h][0][: min(h + chunk, n) - h])
                for h in heads]
        deps = [np.asarray(outs[h][1][: min(h + chunk, n) - h])
                for h in heads]
        img = np.concatenate(imgs).reshape(H, W, 3)
        dep = np.concatenate(deps).reshape(H, W)
        return img, dep

    return render_image
