"""Procedural test scene: analytic renders of colored spheres.

Generates a tiny blender-format dataset on disk (transforms_*.json + RGBA
PNGs) so the full provider -> trainer -> eval pipeline can be exercised and
regression-tested without Synthetic-NeRF downloads (the reference has no
test assets either; SURVEY.md §4 calls for exactly this fixture).
"""

from __future__ import annotations

import json
import os

import numpy as np

from pvd_tpu.data.poses import pose_spherical

SPHERES = [
    # (center, radius, rgb)
    (np.array([0.0, 0.0, 0.0]), 0.45, np.array([0.9, 0.25, 0.2])),
    (np.array([0.55, 0.3, 0.0]), 0.22, np.array([0.2, 0.8, 0.3])),
    (np.array([-0.5, -0.25, 0.3]), 0.18, np.array([0.25, 0.35, 0.95])),
]


def _render_analytic(pose: np.ndarray, H: int, W: int, focal: float,
                     textured: bool = False):
    """Ray-trace opaque lambertian-ish spheres; returns [H, W, 4] in [0,1].

    Uses the blender camera convention (x right, y up, camera looks along
    -z), matching what transforms.json poses describe.

    textured=True adds high-frequency procedural surface detail (multi-
    octave sine texture + view-dependent specular lobe) so the fixture
    exercises the fine hash levels and SH view-dependence like a real
    Synthetic-NeRF object; flat shading stays the default so recorded
    PSNR baselines remain comparable.
    """
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], axis=-1
    )
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rd = dirs @ pose[:3, :3].T
    ro = pose[:3, 3]

    best_t = np.full((H, W), np.inf)
    rgb = np.zeros((H, W, 3), np.float32)
    alpha = np.zeros((H, W), np.float32)
    light = np.array([0.577, 0.577, 0.577])
    for center, radius, color in SPHERES:
        oc = ro - center
        b = np.sum(rd * oc, axis=-1)
        c = np.sum(oc * oc) - radius * radius
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit &= (t > 0) & (t < best_t)
        # simple normal-based shading for view-dependence
        p = ro + rd * t[..., None]
        n = (p - center) / radius
        shade = 0.55 + 0.45 * np.clip(-np.sum(n * rd, axis=-1), 0, 1)
        col = color[None, :] * shade[hit, None]
        if textured:
            # multi-octave surface detail in object space (deterministic)
            ph = p[hit]
            tex = np.ones(ph.shape[0], np.float32)
            for freq, amp in ((11.0, 0.25), (29.0, 0.15), (71.0, 0.08)):
                tex *= 1.0 + amp * np.sin(freq * ph[:, 0]) * np.sin(
                    freq * ph[:, 1] + 1.3) * np.sin(freq * ph[:, 2] + 2.1)
            col = col * np.clip(tex, 0.3, 1.7)[:, None]
            # Blinn-Phong specular: genuinely view-dependent color
            hvec = light[None] - rd[hit]
            hvec /= np.linalg.norm(hvec, axis=-1, keepdims=True) + 1e-9
            spec = np.clip(np.sum(n[hit] * hvec, axis=-1), 0, 1) ** 48
            col = col + 0.6 * spec[:, None]
        rgb[hit] = np.clip(col, 0.0, 1.0).astype(np.float32)
        alpha[hit] = 1.0
        best_t[hit] = t[hit]
    return np.concatenate([rgb, alpha[..., None]], axis=-1)


def make_synthetic_scene(
    root: str,
    n_train: int = 12,
    n_val: int = 2,
    n_test: int = 3,
    H: int = 64,
    W: int = 64,
    seed: int = 0,
    textured: bool = False,
):
    """Write a blender-format scene to `root`. Returns root."""
    import cv2

    rng = np.random.default_rng(seed)
    camera_angle_x = 0.6911112070083618  # standard Synthetic-NeRF fov
    focal = W / (2.0 * np.tan(camera_angle_x / 2))

    os.makedirs(root, exist_ok=True)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    for split, n in counts.items():
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for k in range(n):
            theta = rng.uniform(-180, 180)
            phi = rng.uniform(-60, -10)
            pose = pose_spherical(theta, phi, 4.0)
            img = _render_analytic(pose, H, W, focal, textured=textured)
            fname = f"./{split}/r_{k}"
            frames.append(
                {"file_path": fname, "transform_matrix": pose.tolist()}
            )
            bgra = (np.clip(img, 0, 1) * 255).astype(np.uint8)[..., [2, 1, 0, 3]]
            cv2.imwrite(os.path.join(root, f"{split}/r_{k}.png"), bgra)
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
    return root
