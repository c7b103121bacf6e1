"""Random camera-pose synthesis for distillation.

Distillation never looks at real images — each epoch draws a fresh set of
synthetic viewpoints and the teacher's renders become the ground truth
(distill_mutual/utils.py:67-198, 723-735).  Three samplers:

  * synthetic: spherical orbit poses, azimuth U(-180,180), elevation swept
    over [0, 80) with density weighted toward the horizon, radius 4;
  * tank: same but radius U(3,4) and elevation loop over [5, 20);
  * llff: camera positions uniform in the training cameras' bounding box,
    looking at the origin.

All poses pass through nerf_matrix_to_ngp with scale 0.8 (utils.py:53-64).
Host-side numpy (pose synthesis is not a hot path).
"""

from __future__ import annotations

import numpy as np

from pvd_tpu.ops.rays import nerf_matrix_to_ngp


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Blender-style spherical c2w (distill_mutual/utils.py:67-98)."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = radius
    phi = phi_deg / 180.0 * np.pi
    rot_phi = np.array(
        [
            [1, 0, 0, 0],
            [0, np.cos(phi), -np.sin(phi), 0],
            [0, np.sin(phi), np.cos(phi), 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )
    th = theta_deg / 180.0 * np.pi
    rot_theta = np.array(
        [
            [np.cos(th), 0, -np.sin(th), 0],
            [0, 1, 0, 0],
            [np.sin(th), 0, np.cos(th), 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    return flip @ rot_theta @ rot_phi @ c2w


def _sample_sphere_pose(rng: np.random.Generator, elevation: float,
                        rand_radius: bool) -> np.ndarray:
    theta = rng.uniform(-180.0, 180.0)
    phi_hi = min(5.0 - elevation, 0.0)
    phi = rng.uniform(-elevation, phi_hi)
    radius = rng.uniform(3.0, 4.0) if rand_radius else 4.0
    return pose_spherical(theta, phi, radius)


def _elevation_sweep(rng, lo: int, hi: int, rand_radius: bool) -> np.ndarray:
    poses = [_sample_sphere_pose(rng, 8.0, rand_radius)]
    for a in range(lo, hi):
        count = (90 - a) // 15 + 1  # more poses near the horizon
        poses.extend(_sample_sphere_pose(rng, float(a), rand_radius)
                     for _ in range(count))
    return np.stack([nerf_matrix_to_ngp(p, scale=0.8) for p in poses])


def _lookat_origin_poses(centers: np.ndarray) -> np.ndarray:
    """Build c2w matrices that look from `centers` at the origin with the
    reference's (0,-1,0) up convention (utils.py:150-176)."""
    def normalize(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    fwd = -normalize(centers)
    up = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (len(centers), 1))
    right = normalize(np.cross(fwd, up))
    up = normalize(np.cross(right, fwd))
    poses = np.tile(np.eye(4, dtype=np.float32), (len(centers), 1, 1))
    poses[:, :3, 0] = right
    poses[:, :3, 1] = up
    poses[:, :3, 2] = fwd
    poses[:, :3, 3] = centers
    return poses


def rand_orbit_poses(rng: np.random.Generator, size: int, radius: float = 1.0,
                     theta_range=(np.pi / 3, 2 * np.pi / 3),
                     phi_range=(0.0, 2 * np.pi)) -> np.ndarray:
    """Orbit-camera sampler (provider.py rand_poses:32-84), used by the
    rand_pose training augmentation."""
    thetas = rng.uniform(*theta_range, size)
    phis = rng.uniform(*phi_range, size)
    centers = np.stack(
        [
            radius * np.sin(thetas) * np.sin(phis),
            radius * np.cos(thetas),
            radius * np.sin(thetas) * np.cos(phis),
        ],
        axis=-1,
    ).astype(np.float32)
    return _lookat_origin_poses(centers)


def get_rand_poses(rng: np.random.Generator, data_type: str = "synthetic",
                   train_poses: np.ndarray | None = None) -> np.ndarray:
    """Fresh distillation viewpoints for one epoch (utils.py:100-198).

    train_poses: [B, 4, 4] (already NGP convention) — required for llff to
    bound the random camera positions.
    """
    if data_type == "synthetic":
        return _elevation_sweep(rng, 0, 80, rand_radius=False)
    if data_type == "tank":
        return _elevation_sweep(rng, 5, 20, rand_radius=True)
    if data_type == "llff":
        assert train_poses is not None, "llff pose sampling needs train poses"
        t = train_poses[:, :3, 3]
        lo, hi = t.min(axis=0) - 1e-6, t.max(axis=0) + 1e-6
        centers = rng.uniform(lo, hi, size=(30, 3)).astype(np.float32)
        poses = _lookat_origin_poses(centers)
        poses[:, 0, 0] = -poses[:, 0, 0]  # reference's llff handedness fix
        return poses
    raise ValueError(f"unknown data_type: {data_type}")
