"""Shape-static volumetric rendering.

This module is the TPU-native redesign of `NeRFRenderer.run_cuda`
(distill_mutual/renderer.py:319-556) and the march/composite CUDA kernels
(raymarching.cu:313-494, 504-697, 704-948).

Core reformulation ("occupancy lattice + compaction"): with step size
dt = clamp(t * dt_gamma, dt_min, dt_max), the reference's per-ray DDA visits
a t-sequence that is INDEPENDENT of occupancy — empty-space skipping only
decides which lattice points get evaluated, and the skip lands back on the
same lattice (every advance is an integer number of dt steps when
dt_gamma == 0).  So marching becomes:

  1. generate the per-ray t-lattice [n_rays, max_steps] (closed form for
     dt_gamma == 0, a lax.scan otherwise);
  2. gather occupancy bits at every lattice point (one big vectorized
     lookup);
  3. compact each ray's occupied points into the first `max_samples` slots
     via a per-row cumsum + scatter — the static-shape replacement for the
     CUDA kernel's atomicAdd slot reservation and `mean_count` capping
     (raymarching.py:233-238).

Everything downstream (field query, compositing) then runs on dense
[n_rays, max_samples] tensors with a validity mask, which is exactly what
the MXU wants.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from pvd_tpu.config import ModelSpec, RenderSpec
from pvd_tpu.models.api import background_rgb, field_forward
from pvd_tpu.ops.aabb import near_far_from_aabb, polar_from_ray
from pvd_tpu.ops.composite import composite_rays, composite_stratified
from pvd_tpu.ops.sampling import sample_pdf, stratified_z_vals
from pvd_tpu.render.occupancy import OccupancyState

SQRT3 = math.sqrt(3.0)


class MarchedSamples(NamedTuple):
    """Padded static-shape replacement for the CSR (xyzs/dirs/deltas/rays)
    quadruple the reference threads through distillation
    (renderer.py:374-394 `inherited_params`)."""

    t: jnp.ndarray  # [N, S] sample distances (0 in padded slots)
    dt: jnp.ndarray  # [N, S] integration step of each sample
    delta_depth: jnp.ndarray  # [N, S] real marched distance incl. skips
    mask: jnp.ndarray  # [N, S] bool validity
    t0: jnp.ndarray  # [N] march start (near, possibly perturbed)


def _t_lattice(t0, rspec: RenderSpec):
    """Per-ray t-sequence [N, L] and step sizes [N, L]."""
    L = rspec.max_steps
    dt_min = 2.0 * SQRT3 / rspec.max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (rspec.cascades - 1)) / rspec.grid_size
    if rspec.dt_gamma == 0.0:
        k = jnp.arange(L, dtype=jnp.float32)
        ts = t0[:, None] + k[None, :] * dt_min
        dts = jnp.full_like(ts, dt_min)
    else:
        def step(t, _):
            dt = jnp.clip(t * rspec.dt_gamma, dt_min, dt_max)
            return t + dt, (t, dt)

        _, (ts, dts) = lax.scan(step, t0, None, length=L)
        ts, dts = ts.T, dts.T
    return ts, dts


def _occupancy_lookup(bitfield, pos, dts, rspec: RenderSpec):
    """Occupancy bit at each lattice position.

    pos: [..., 3] clamped to [-bound, bound]; dts: [...] step sizes.
    Cascade selection follows raymarching.cu:44-56: mip level is the max of
    the position exponent and the step-size exponent.
    """
    H, C = rspec.grid_size, rspec.cascades
    if C == 1:
        mip_bound = min(1.0, rspec.bound)
        level = None
    else:
        mx = jnp.max(jnp.abs(pos), axis=-1)
        lvl_pos = jnp.clip(jnp.frexp(mx)[1], 0, C - 1)
        lvl_dt = jnp.clip(jnp.frexp(dts * H * 0.5)[1], 0, C - 1)
        level = jnp.maximum(lvl_pos, lvl_dt)
        mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32), rspec.bound)[
            ..., None
        ]
    n = (0.5 * (pos / mip_bound + 1.0) * H).astype(jnp.int32)
    n = jnp.clip(n, 0, H - 1)
    flat = (n[..., 0] * H + n[..., 1]) * H + n[..., 2]
    if level is not None:
        flat = flat + level * (H * H * H)
    return bitfield[flat]


def _compact_first_k(mask, k: int):
    """Positions of the first k True entries per row (binary search over the
    prefix sum — scatter-free; XLA TPU scatters serialize).

    mask: [N, L] bool. Returns (pos [N, k] clamped indices, valid [N, k]).
    """
    cum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)
    pos = jax.vmap(lambda c: jnp.searchsorted(c, targets, side="left"))(cum)
    valid = targets[None, :] <= cum[:, -1:]
    return jnp.minimum(pos, mask.shape[1] - 1), valid


def march_rays(
    bitfield,
    rays_o,
    rays_d,
    nears,
    fars,
    rspec: RenderSpec,
    perturb_key=None,
    bitfield_dilated=None,
) -> MarchedSamples:
    """March all rays through the occupancy grid into padded sample slots.

    When `bitfield_dilated` is given and the scene qualifies
    (rspec.use_coarse_march), a two-stage exact test runs first: the dilated
    field is probed every `coarse_stride` lattice points; only lattice
    windows whose probe hits are fine-tested.  The dilation radius (2 cells)
    covers the max distance between a window's points and its probe, so no
    occupied sample can be missed.
    """
    N = rays_o.shape[0]
    S = rspec.max_samples
    L = rspec.max_steps
    dt_min = 2.0 * SQRT3 / rspec.max_steps

    t0 = nears
    if perturb_key is not None:
        t0 = t0 + dt_min * jax.random.uniform(perturb_key, (N,))

    use_coarse = bitfield_dilated is not None and rspec.use_coarse_march
    if use_coarse:
        F = rspec.coarse_stride
        # probe the dilated field at every F-th lattice point
        kc = jnp.arange(0, L, F, dtype=jnp.float32)  # [L/F]
        ts_c = t0[:, None] + kc[None, :] * dt_min
        pos_c3 = rays_o[:, None, :] + ts_c[..., None] * rays_d[:, None, :]
        pos_c3 = jnp.clip(pos_c3, -rspec.bound, rspec.bound)
        hit = _occupancy_lookup(bitfield_dilated, pos_c3, ts_c * 0 + dt_min,
                                rspec)
        hit = hit & (ts_c < fars[:, None])
        # keep the first S candidate windows, expand each to its F fine pts
        win_pos, win_valid = _compact_first_k(hit, S)  # [N, S]
        fine_idx = (win_pos[..., None] * F
                    + jnp.arange(F, dtype=jnp.int32)[None, None, :])
        fine_idx = fine_idx.reshape(N, S * F)  # lattice indices, ascending
        ts = t0[:, None] + fine_idx.astype(jnp.float32) * dt_min
        dts = jnp.full_like(ts, dt_min)
        lattice_valid = jnp.repeat(win_valid, F, axis=1)
    else:
        ts, dts = _t_lattice(t0, rspec)  # [N, L]
        lattice_valid = None

    pos = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    pos = jnp.clip(pos, -rspec.bound, rspec.bound)

    occ = _occupancy_lookup(bitfield, pos, dts, rspec)
    occ = occ & (ts < fars[:, None])
    if lattice_valid is not None:
        occ = occ & lattice_valid

    # compact occupied lattice points into the first S slots per ray
    pos_c, mask = _compact_first_k(occ, S)
    t_out = jnp.take_along_axis(ts, pos_c, axis=1) * mask
    dt_out = jnp.take_along_axis(dts, pos_c, axis=1) * mask

    # delta_depth_i = (t_i + dt_i) - (t_{i-1} + dt_{i-1}), seeded with t0
    # (the "real delta" channel used for depth, raymarching.cu:460-465)
    u = t_out + dt_out
    prev = jnp.concatenate([t0[:, None], u[:, :-1]], axis=1)
    delta_depth = jnp.where(mask, u - prev, 0.0)

    return MarchedSamples(t=t_out, dt=dt_out, delta_depth=delta_depth,
                          mask=mask, t0=t0)


def sample_positions(samples: MarchedSamples, rays_o, rays_d, bound: float):
    """[N, S, 3] clamped world positions of the marched samples."""
    pos = rays_o[:, None, :] + samples.t[..., None] * rays_d[:, None, :]
    return jnp.clip(pos, -bound, bound)


def render_rays(
    params,
    spec: ModelSpec,
    rspec: RenderSpec,
    occ: OccupancyState,
    rays_o,
    rays_d,
    *,
    training: bool,
    bg_color=1.0,
    perturb_key=None,
    want_color: bool = True,
    composite: bool = True,
    early_stop: bool = False,
    inherited: Optional[MarchedSamples] = None,
):
    """Full occupancy-grid render (reference run_cuda, renderer.py:319-556).

    Returns a dict with point tensors (sigmas, sigma_logit, fea_sc, rgb_l,
    mask, samples) and — when composite=True — image [N,3], depth [N],
    weights_sum [N].  `inherited` replays another model's exact samples
    (the distillation alignment invariant, renderer.py:374-394).
    `want_color=False` is distillation stage 1; `composite=False` with color
    is stage 2.
    """
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    aabb = occ.aabb_train if training else occ.aabb_infer
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, rspec.min_near)

    if inherited is None:
        samples = march_rays(
            occ.bitfield, rays_o, rays_d, nears, fars, rspec, perturb_key,
            bitfield_dilated=occ.bitfield_dilated,
        )
    else:
        samples = inherited

    N, S = samples.t.shape
    xyz = sample_positions(samples, rays_o, rays_d, rspec.bound)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3))

    out_f = field_forward(
        params, spec, xyz.reshape(-1, 3), dirs.reshape(-1, 3), aabb,
        want_color=want_color,
    )

    result = {
        "samples": samples,
        # fraction of rays that exhausted the max_samples budget — a high
        # value means the occupancy grid is too dense for the padded budget
        # (e.g. density_thresh too low) and samples are being truncated
        "budget_hit_frac": jnp.mean(samples.mask[:, -1].astype(jnp.float32)),
        "sigmas": out_f.sigma.reshape(N, S),
        "sigma_logit": out_f.sigma_logit.reshape(N, S),
        "fea_sc": None if out_f.fea_sc is None
        else out_f.fea_sc.reshape(N, S, -1),
        "rgb_l": None if out_f.rgb is None else out_f.rgb.reshape(N, S, 3),
        "mask": samples.mask,
        "nears": nears,
        "fars": fars,
    }
    if not (want_color and composite):
        return result

    if spec.bg_radius > 0:
        polar = polar_from_ray(rays_o, rays_d, spec.bg_radius)
        bg_color = background_rgb(params, spec, polar, rays_d)

    sigmas = result["sigmas"] * rspec.density_scale
    ws, depth_raw, image, weights = composite_rays(
        sigmas,
        result["rgb_l"],
        samples.dt,
        samples.delta_depth,
        samples.mask,
        early_stop=early_stop,
    )
    image = image + (1.0 - ws)[:, None] * jnp.asarray(bg_color, image.dtype)
    depth = jnp.clip(depth_raw - nears, 0.0, None) / (fars - nears + 1e-6)

    result.update(image=image, depth=depth, weights_sum=ws, weights=weights)
    return result


def render_stratified(
    params,
    spec: ModelSpec,
    rspec: RenderSpec,
    aabb,
    rays_o,
    rays_d,
    *,
    rng=None,
    perturb: bool = False,
    bg_color=1.0,
):
    """Fixed-count stratified render (reference `run`, renderer.py:139-317).

    Dead code in the reference (both mains force cuda_ray); first-class here
    because it is the fully dense, occupancy-free formulation — the
    CPU-runnable parity target (BASELINE config 1) and the distill-anything
    fallback when no occupancy grid exists yet.
    """
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    N = rays_o.shape[0]
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, rspec.min_near)
    # missed rays would put z at FLT_MAX; keep them finite and let weights==0
    miss = nears >= 3.0e38
    nears_s = jnp.where(miss, 0.0, nears)
    fars_s = jnp.where(miss, 1.0, fars)

    k_strat = k_pdf = None
    if rng is not None:
        k_strat, k_pdf = jax.random.split(rng)

    z, sample_dist = stratified_z_vals(
        k_strat, nears_s, fars_s, rspec.num_steps, perturb and rng is not None
    )

    def query(z_vals):
        xyz = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
        xyz = jnp.clip(xyz, aabb[:3], aabb[3:])
        dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)
        o = field_forward(
            params, spec, xyz.reshape(-1, 3), dirs.reshape(-1, 3), aabb, True
        )
        T = z_vals.shape[1]
        return o.sigma.reshape(N, T), o.rgb.reshape(N, T, 3)

    sigmas, rgbs = query(z)

    if rspec.upsample_steps > 0:
        # importance-resample around density peaks (renderer.py:200-255)
        _, weights, _ = composite_stratified(
            rspec.density_scale * lax.stop_gradient(sigmas), z, sample_dist,
            jnp.zeros((N, rspec.num_steps, 3)),
        )
        deltas = jnp.diff(z, axis=-1)
        z_mid = z[..., :-1] + 0.5 * deltas
        new_z = sample_pdf(
            k_pdf, z_mid, weights[:, 1:-1], rspec.upsample_steps,
            det=rng is None,
        )
        new_z = lax.stop_gradient(new_z)
        new_sigmas, new_rgbs = query(new_z)
        z = jnp.concatenate([z, new_z], axis=1)
        order = jnp.argsort(z, axis=1)
        z = jnp.take_along_axis(z, order, axis=1)
        sigmas = jnp.take_along_axis(
            jnp.concatenate([sigmas, new_sigmas], axis=1), order, axis=1
        )
        rgbs = jnp.take_along_axis(
            jnp.concatenate([rgbs, new_rgbs], axis=1), order[..., None], axis=1
        )

    ws, weights, image = composite_stratified(
        rspec.density_scale * sigmas, z, sample_dist, rgbs
    )

    if spec.bg_radius > 0:
        polar = polar_from_ray(rays_o, rays_d, spec.bg_radius)
        bg_color = background_rgb(params, spec, polar, rays_d)

    image = image + (1.0 - ws)[:, None] * jnp.asarray(bg_color, image.dtype)
    z_norm = jnp.clip((z - nears_s[:, None]) / (fars_s - nears_s + 1e-6)[:, None],
                      0.0, 1.0)
    depth = jnp.sum(weights * z_norm, axis=-1)
    return {"image": image, "depth": depth, "weights_sum": ws}
