"""Data-parallel train steps over the ray axis (shard_map).

Design (jax-ml scaling-book recipe): a 1-D mesh over the 'rays' axis;
parameters, optimizer state, and occupancy grids replicated; the ray batch
sharded.  The per-ray pipeline (probe marching, global sample compaction,
field query, compositing) runs INSIDE jax.shard_map so every device works
on its local shard with its own static sample budget — the batch-wide
cumsum/scatter of the compaction never crosses devices.  The only
collectives are the loss/metric pmean and the gradient psum that
jax.grad-through-shard_map inserts for the replicated parameters over ICI.
This replaces the reference's dormant torch.distributed all_reduce hooks
(distill_mutual/utils.py:1243-1265).

The objectives are the SAME functions the single-chip steps use
(engine/train_steps.teacher_loss / distill_loss), so DP-vs-single-chip
equivalence is structural: a DP step over n shards equals a single-chip
step whose batch is the concatenation of the shards (up to the mean-of-
means vs global-mean distinction, exact for equal shard sizes).  Known
deviation: the distill point losses normalize by each shard's own
valid-sample count before the pmean, so shards weigh equally regardless
of how many valid samples they drew (the rgb term is exact; PSNR is
computed from the pmean'd MSE so it matches single-chip exactly).

Ray generation happens per shard (each device samples its own pixels from
the replicated pose/image with a device-folded key), so no ray data ever
moves between hosts and devices beyond the replicated inputs.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from pvd_tpu.config import ModelSpec, PVDConfig, RenderSpec
from pvd_tpu.engine.train_steps import (
    TrainState,
    compose_gt,
    distill_loss,
    teacher_loss,
)
from pvd_tpu.ops.rays import get_rays


def _pmean_tree(tree):
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, "rays"), tree)


def make_dp_teacher_step(
    spec: ModelSpec,
    rspec: RenderSpec,
    opt: optax.GradientTransformation,
    cfg: PVDConfig,
    mesh: Mesh,
    intrinsics,
    H: int,
    W: int,
    image_channels: int,
    ema_decay: float = -1.0,
    use_error_map: bool = False,
    scan_steps: int = 0,
):
    """Returns jitted step(state, pose [4,4], image_flat [H*W, C], key).

    state/pose/image replicated; each device ray-samples its
    num_rays/n_devices share in-shard.  With use_error_map the signature
    becomes step(state, pose, image_flat, emap [128*128], key) ->
    (state, new_emap, metrics): the 128^2 coarse map REPLICATES, every
    device importance-draws its ray share from it (get_rays, reference
    utils.py:353-381), and the per-ray losses + coarse indices come back
    sharded over 'rays' so the EMA cell update (utils.py:1125-1133) runs
    once at the jit level over the full batch — single-chip semantics.

    scan_steps > 0 returns instead
    step(state, images_flat [B, H*W, C], idxs [K] i32, poses [K,4,4], key)
    -> (state, metrics stacked [K]): K sharded optimizer steps in one
    lax.scan dispatch (shard_map composes under scan; the psum'd grads and
    pmean'd metrics are identical to K single dispatches).  Combined with
    use_error_map the signature gains emap_all [B, 128*128] (before `key`)
    and returns (state, emap_all, logs) — the map rides the scan carry.
    """
    intr = tuple(float(v) for v in intrinsics)
    n_dev = mesh.devices.size
    assert cfg.num_rays % n_dev == 0, (cfg.num_rays, n_dev)
    local_rays = cfg.num_rays // n_dev

    def local_grad(params, occ, pose, image_flat, emap, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("rays"))
        k_rays, k_bg, k_perturb = jax.random.split(key, 3)
        rays = get_rays(k_rays, pose[None], intr, H, W, local_rays,
                        error_map=emap[None] if use_error_map else None)
        o, d = rays["rays_o"][0], rays["rays_d"][0]
        pix = image_flat[rays["inds"][0]]
        if cfg.color_space == "linear":
            from pvd_tpu.utils.misc import srgb_to_linear

            pix = jnp.concatenate(
                [srgb_to_linear(pix[..., :3]), pix[..., 3:]], axis=-1
            )
        gt, bg = compose_gt(pix, image_channels, spec.bg_radius, k_bg)

        # grad INSIDE the shard_map with an explicit pmean: transposing a
        # shard_map whose only device-varying input is the folded RNG can't
        # infer the grads' replication, so we don't ask it to
        def loss_fn(p):
            loss, (out, per_ray) = teacher_loss(p, spec, rspec, cfg, occ, o,
                                                d, gt, bg, k_perturb)
            metrics = {
                "loss": loss,
                # shard-local MSE; PSNR is taken AFTER the pmean so it
                # matches the single-chip global-MSE PSNR (no Jensen gap
                # from averaging log-space values)
                "mse": jnp.mean((out["image"] - gt) ** 2),
                "budget_hit": out["budget_hit_frac"],
                "mask_frac": out["mask_frac"],
            }
            return loss, (metrics, per_ray)

        (_, (metrics, per_ray)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        coarse = (rays["inds_coarse"][0] if use_error_map
                  else jnp.zeros((local_rays,), jnp.int32))
        return (_pmean_tree(metrics), _pmean_tree(grads),
                coarse, jax.lax.stop_gradient(per_ray))

    smap = jax.shard_map(
        local_grad,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P("rays"), P("rays")),
    )

    def _apply(state, metrics, grads):
        metrics = dict(metrics)
        metrics["psnr"] = -10.0 * jnp.log10(metrics.pop("mse") + 1e-12)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            from pvd_tpu.engine.optim import ema_update

            ema = ema_update(ema, params, ema_decay)
        return (
            state.replace(params=params, opt_state=opt_state,
                          step=state.step + 1, ema_params=ema),
            metrics,
        )

    if use_error_map and scan_steps == 0:

        @jax.jit
        def step_emap(state: TrainState, pose, image_flat, emap, key):
            metrics, grads, coarse, per_ray = smap(
                state.params, state.occ, pose, image_flat, emap, key)
            state, metrics = _apply(state, metrics, grads)
            new_emap = emap.at[coarse].set(0.1 * emap[coarse] + 0.9 * per_ray)
            return state, new_emap, metrics

        return step_emap

    if scan_steps > 0:
        # NOTE: no donate_argnums — buffer donation through the axon
        # tunnel raises TPU InvalidArgument at execution time
        EC = 128 * 128

        def _scan_core(state, images_flat, idxs, poses, emap_all, key):
            def body(carry, inp):
                st, em = carry
                pose_i, idx_i = inp
                # per-body fold of the live step counter (same contract as
                # the single-chip scan: constant caller keys are fine)
                k = jax.random.fold_in(key, st.step)
                row = (jax.lax.dynamic_slice(em, (idx_i, 0), (1, EC))[0]
                       if use_error_map else jnp.zeros((EC,), jnp.float32))
                metrics, grads, coarse, per_ray = smap(
                    st.params, st.occ, pose_i, images_flat[idx_i], row, k)
                st, metrics = _apply(st, metrics, grads)
                if use_error_map:
                    # EMA cell update in the scan carry (utils.py:1125-1133)
                    upd = 0.1 * row[coarse] + 0.9 * per_ray
                    em = (em.reshape(-1).at[idx_i * EC + coarse].set(upd)
                          .reshape(em.shape))
                return (st, em), metrics

            (state, emap_all), logs = jax.lax.scan(
                body, (state, emap_all), (poses, idxs))
            return state, emap_all, logs

        if use_error_map:
            @jax.jit
            def step_scan_emap(state: TrainState, images_flat, idxs, poses,
                               emap_all, key):
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
    def step(state: TrainState, pose, image_flat, key):
        zero = jnp.zeros((128 * 128,), jnp.float32)
        metrics, grads, _, _ = smap(state.params, state.occ, pose,
                                    image_flat, zero, key)
        return _apply(state, metrics, grads)

    return step


def make_dp_distill_step(
    spec_stu: ModelSpec,
    spec_tea: ModelSpec,
    rspec: RenderSpec,
    opt: optax.GradientTransformation,
    cfg: PVDConfig,
    mesh: Mesh,
    intrinsics,
    H: int,
    W: int,
    stage: int = 3,
    ema_decay: float = -1.0,
    use_error_map: bool = False,
    scan_steps: int = 0,
):
    """Data-parallel distillation step (stage static).

    step(state, params_tea, occ_tea, pose [4,4], key): everything
    replicated; rays sampled per shard.  The student marches; the teacher
    inherits the student's samples AND compaction, so the teacher pass
    shards identically with zero extra communication.

    With use_error_map the signature becomes
    step(state, params_tea, occ_tea, pose, emap [128*128], key) ->
    (state, new_emap, logs): the replicated coarse map drives per-shard
    importance draws and — at stage 3 with L2 loss — the sharded per-ray
    rgb losses EMA-update the sampled cells once at the jit level
    (distill_mutual/utils.py:1120-1130; same semantics as single-chip).

    scan_steps > 0 fuses K sharded steps into one lax.scan dispatch
    (same contract as train_steps.make_distill_step); combined with
    use_error_map the signature gains idxs [K] i32 + emap_all [B, 128*128]
    and returns (state, emap_all, logs) — the map rides the scan carry.
    """
    assert stage in (1, 2, 3)
    intr = tuple(float(v) for v in intrinsics)
    n_dev = mesh.devices.size
    assert cfg.num_rays % n_dev == 0, (cfg.num_rays, n_dev)
    local_rays = cfg.num_rays // n_dev

    def local_grad(params_stu, params_tea, occ, occ_tea, pose, emap, key,
                   step_i):
        key = jax.random.fold_in(key, jax.lax.axis_index("rays"))
        k_rays, k_bg, k_perturb = jax.random.split(key, 3)
        rays = get_rays(k_rays, pose[None], intr, H, W, local_rays,
                        error_map=emap[None] if use_error_map else None)
        o, d = rays["rays_o"][0], rays["rays_d"][0]
        bg = jax.random.uniform(k_bg, (local_rays, 3))

        def loss_fn(p):
            return distill_loss(
                p, params_tea, spec_stu, spec_tea, rspec, cfg, stage,
                occ, occ_tea, o, d, bg, k_perturb, step_i,
            )

        (_, (logs, per_ray)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params_stu)
        if per_ray is None:  # stages 1/2 render no image
            per_ray = jnp.zeros((local_rays,), jnp.float32)
        coarse = (rays["inds_coarse"][0] if use_error_map
                  else jnp.zeros((local_rays,), jnp.int32))
        return (_pmean_tree(logs), _pmean_tree(grads),
                coarse, jax.lax.stop_gradient(per_ray))

    smap = jax.shard_map(
        local_grad,
        mesh=mesh,
        in_specs=(P(),) * 8,
        out_specs=(P(), P(), P("rays"), P("rays")),
    )

    def _apply(state, logs, grads):
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            from pvd_tpu.engine.optim import ema_update

            ema = ema_update(ema, params, ema_decay)
        return (
            state.replace(params=params, opt_state=opt_state,
                          step=state.step + 1, ema_params=ema),
            logs,
        )

    if use_error_map and scan_steps == 0:

        @jax.jit
        def step_emap(state: TrainState, params_tea, occ_tea, pose, emap,
                      key):
            logs, grads, coarse, per_ray = smap(
                state.params, params_tea, state.occ, occ_tea, pose, emap,
                key, state.step)
            state, logs = _apply(state, logs, grads)
            new_emap = emap
            if stage == 3 and cfg.loss_type == "L2":
                new_emap = emap.at[coarse].set(
                    0.1 * emap[coarse] + 0.9 * per_ray)
            return state, new_emap, logs

        return step_emap

    if scan_steps > 0:
        # same scan contract as the single-chip distill scan
        # (train_steps.make_distill_step): K sharded steps, one dispatch;
        # with use_error_map the full [B, 128*128] map rides the carry
        EC = 128 * 128

        def _scan_core(state, params_tea, occ_tea, poses, idxs, emap_all,
                       key):
            def body(carry, inp):
                st, em = carry
                pose_i, idx_i = inp
                k = jax.random.fold_in(key, st.step)  # constant-key ok
                row = (jax.lax.dynamic_slice(em, (idx_i, 0), (1, EC))[0]
                       if use_error_map else jnp.zeros((EC,), jnp.float32))
                logs, grads, coarse, per_ray = smap(
                    st.params, params_tea, st.occ, occ_tea, pose_i, row, k,
                    st.step)
                st, logs = _apply(st, logs, grads)
                if (use_error_map and stage == 3
                        and cfg.loss_type == "L2"):
                    upd = 0.1 * row[coarse] + 0.9 * per_ray
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

    @jax.jit
    def step(state: TrainState, params_tea, occ_tea, pose, key):
        zero = jnp.zeros((128 * 128,), jnp.float32)
        logs, grads, _, _ = smap(state.params, params_tea, state.occ,
                                 occ_tea, pose, zero, key, state.step)
        return _apply(state, logs, grads)

    return step


def make_dp_occ_update(spec: ModelSpec, rspec: RenderSpec, mesh: Mesh):
    """Occupancy-grid refresh with the density sweep sharded over cells.

    The full-mode sweep queries H^3 cells through the field network —
    shard_map splits the cell axis so each device queries its share; the
    EMA/bitfield/neighbor-mask assembly is elementwise and runs sharded,
    with results replicated on exit.
    """
    from functools import partial as _partial

    from pvd_tpu.models import field_density
    from pvd_tpu.render import update_density_grid

    def density_sharded(params, aabb, x):
        # x arrives replicated [M, 3]; split over devices, query, all-gather
        n_dev = mesh.devices.size
        M = x.shape[0]
        pad = (-M) % n_dev

        def local(xs):
            return field_density(params, spec, xs, aabb)

        xp = jnp.pad(x, ((0, pad), (0, 0)))
        sig = jax.shard_map(
            local, mesh=mesh, in_specs=P("rays"), out_specs=P("rays")
        )(xp)
        return sig[:M]

    @_partial(jax.jit, static_argnames=("full",))
    def occ_update(occ, params, key, full: bool):
        def dens(x):
            return density_sharded(params, occ.aabb_train, x)

        return update_density_grid(occ, dens, rspec, key, full=full)

    return occ_update


def make_dp_eval_renderer(spec: ModelSpec, rspec: RenderSpec, mesh: Mesh,
                          chunk: int = 16384):
    """Chunked full-image renderer with each chunk's rays sharded.

    Same contract as engine.train_steps.make_eval_renderer; each device
    renders chunk/n_devices rays of every chunk (per-shard sample budget,
    zero collectives — outputs concatenate over the ray axis).  Shares the
    single-chip renderer's truncation semantics: a shard whose compacted
    budget truncates flags the chunk, and flagged chunks re-render on a
    4x -> uncompacted budget ladder.
    """
    import dataclasses as _dc

    from pvd_tpu.ops.rays import pixel_dirs
    from pvd_tpu.render.renderer import render_rays

    n_dev = mesh.devices.size
    chunk = max(n_dev, (chunk // n_dev) * n_dev)
    local = chunk // n_dev
    base_spr = rspec.samples_per_ray
    _cache = {}

    def _build(intr, H: int, W: int, spr: float):
        if spr > 0:  # full trajectory (see make_eval_renderer)
            rs = _dc.replace(rspec, samples_per_ray=spr,
                             max_samples=rspec.max_steps)
        else:
            # compaction off still marches the full trajectory (eval is
            # never clipped by the training S_max; see make_eval_renderer)
            rs = _dc.replace(rspec, samples_per_ray=0.0,
                             max_samples=rspec.max_steps)

        def local_render(params, occ, pose, head):
            i_dev = jax.lax.axis_index("rays")
            inds = head + i_dev * local + jnp.arange(local)
            inds = jnp.minimum(inds, H * W - 1)
            dirs_cam = pixel_dirs(intr, inds, H, W)
            d = dirs_cam @ pose[:3, :3].T
            o = jnp.broadcast_to(pose[:3, 3], d.shape)
            out = render_rays(params, spec, rs, occ, o, d,
                              training=False, bg_color=1.0, early_stop=True)
            trunc = (out["compact_frac"] > 1.0) if "compact_frac" in out \
                else jnp.bool_(False)
            any_trunc = jax.lax.pmax(trunc.astype(jnp.int32), "rays") > 0
            return out["image"], out["depth"], any_trunc

        return jax.jit(jax.shard_map(
            local_render,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P("rays"), P("rays"), P()),
        ))

    def render_image(params, occ, pose, intrinsics, H, W):
        import numpy as np

        intr = tuple(float(v) for v in intrinsics)
        pose_j = jnp.asarray(pose, jnp.float32)
        n = H * W
        heads = list(range(0, n, chunk))
        ladder = ([base_spr, base_spr * 4.0, base_spr * 16.0]
                  if base_spr > 0 else [0.0])

        outs = {}
        pending = heads
        for spr in ladder:
            key = (intr, H, W, spr)
            if key not in _cache:
                _cache[key] = _build(intr, H, W, spr)
            render_chunk = _cache[key]
            # dispatch every pending chunk before touching any result,
            # then read ALL truncation flags back in ONE stacked host
            # readback per ladder rung — a per-chunk bool() costs the
            # ~30 ms flat tunnel readback each (157 chunks at 800x800
            # would be ~5 s of pure sync; same pattern as the single-chip
            # renderer, engine/train_steps.py make_eval_renderer)
            batch = [render_chunk(params, occ, pose_j, jnp.int32(h))
                     for h in pending]
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

        imgs = [np.asarray(outs[h][0][: min(h + chunk, n) - h])
                for h in heads]
        deps = [np.asarray(outs[h][1][: min(h + chunk, n) - h])
                for h in heads]
        img = np.concatenate(imgs).reshape(H, W, 3)
        dep = np.concatenate(deps).reshape(H, W)
        return img, dep

    return render_image
