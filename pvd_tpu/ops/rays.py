"""Camera ray generation and pose conventions.

jnp equivalents of the reference's `get_rays` (distill_mutual/utils.py:325-404)
and `nerf_matrix_to_ngp` (provider.py:18-29).  Pixel-index sampling uses the
JAX PRNG instead of torch.randint; the error-map importance sampler draws from
a 128x128 coarse grid exactly like the reference.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 0.33) -> np.ndarray:
    """NeRF (blender) c2w -> NGP convention: axis cycle + y/z flip + t*scale."""
    return np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


def pixel_dirs(intrinsics, inds, H: int, W: int):
    """Unit camera-space directions for flat pixel indices [..., N]."""
    fx, fy, cx, cy = (jnp.float32(v) for v in intrinsics)
    px = inds // W  # row  (the reference's meshgrid is transposed: i is row-major)
    py = inds % W  # col
    # Reference: i over width, j over height, transposed then flattened row-major,
    # so flat index = row * W + col with i (x) = col + 0.5, j (y) = row + 0.5.
    i = py.astype(jnp.float32) + 0.5
    j = px.astype(jnp.float32) + 0.5
    zs = jnp.ones_like(i)
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    d = jnp.stack([xs, ys, zs], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def get_rays(rng, poses, intrinsics, H: int, W: int, n_rays: int = -1,
             error_map=None):
    """Generate per-step rays.

    Args:
      rng: PRNG key (unused when n_rays <= 0).
      poses: [B, 4, 4] c2w.
      intrinsics: (fx, fy, cx, cy).
      n_rays: rays per image; <= 0 renders the full image in scanline order.
      error_map: optional [B, 128*128] sampling weights (importance mode).

    Returns dict with rays_o, rays_d: [B, N, 3]; inds: [B, N] flat pixel ids;
    inds_coarse: [B, N] when error_map is given.
    """
    poses = jnp.asarray(poses, jnp.float32)
    B = poses.shape[0]
    out = {}

    if n_rays > 0:
        n_rays = min(n_rays, H * W)
        if error_map is None:
            inds = jax.random.randint(rng, (n_rays,), 0, H * W)
            inds = jnp.broadcast_to(inds[None], (B, n_rays))
        else:
            k_cat, k_jx, k_jy = jax.random.split(rng, 3)
            logits = jnp.log(jnp.maximum(jnp.asarray(error_map, jnp.float32), 1e-12))
            # categorical with replacement (the reference uses multinomial
            # without replacement; with 16384 cells and <=8192 draws the
            # difference is a slightly heavier head, acceptable here)
            inds_coarse = jax.random.categorical(k_cat, logits, axis=-1,
                                                 shape=(B, n_rays))
            ix, iy = inds_coarse // 128, inds_coarse % 128
            sx, sy = H / 128.0, W / 128.0
            jx = jax.random.uniform(k_jx, (B, n_rays))
            jy = jax.random.uniform(k_jy, (B, n_rays))
            ix = jnp.clip((ix * sx + jx * sx).astype(jnp.int32), 0, H - 1)
            iy = jnp.clip((iy * sy + jy * sy).astype(jnp.int32), 0, W - 1)
            inds = ix * W + iy
            out["inds_coarse"] = inds_coarse
        out["inds"] = inds
    else:
        inds = jnp.broadcast_to(jnp.arange(H * W)[None], (B, H * W))
        out["inds"] = inds

    dirs_cam = pixel_dirs(intrinsics, inds, H, W)  # [B, N, 3]
    rays_d = jnp.einsum("bnk,bjk->bnj", dirs_cam, poses[:, :3, :3])
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    out["rays_o"] = rays_o
    out["rays_d"] = rays_d
    return out


def draw_error_map_inds_np(rng: np.random.Generator, emap_row: np.ndarray,
                           H: int, W: int, n_rays: int):
    """Host-side mirror of the importance draw in `get_rays` (the
    preload=False / host-batcher path, where pixel GT is gathered on the
    host so the draw must happen there too; reference get_rays semantics,
    distill_mutual/utils.py:353-381).

    Returns (inds [n_rays] int32 flat pixel ids, inds_coarse [n_rays] int32
    coarse 128x128 cell ids).
    """
    w = np.maximum(np.asarray(emap_row, np.float64), 1e-12)
    w = w / w.sum()
    inds_coarse = rng.choice(128 * 128, size=n_rays, replace=True, p=w)
    ix, iy = inds_coarse // 128, inds_coarse % 128
    sx, sy = H / 128.0, W / 128.0
    jx = rng.random(n_rays)
    jy = rng.random(n_rays)
    px = np.clip((ix * sx + jx * sx).astype(np.int32), 0, H - 1)
    py = np.clip((iy * sy + jy * sy).astype(np.int32), 0, W - 1)
    return (px * W + py).astype(np.int32), inds_coarse.astype(np.int32)
