"""Blender-format dataset loader.

Host-side numpy counterpart of the reference NeRFDataset
(distill_mutual/provider.py:124-326): reads transforms_{split}.json + PNG/JPG
frames via cv2 (BGR(A)->RGB(A), /255, INTER_AREA resize), converts poses with
nerf_matrix_to_ngp, and derives pinhole intrinsics from fl_x/fl_y or
camera_angle_x/y.

TPU-first data path: instead of a torch DataLoader whose collate generates
rays on the GPU, the dataset exposes device-resident pose/image arrays
(optionally preloaded) and the jitted train step does its own on-device pixel
sampling + ray generation (ops/rays.py) — zero per-step host work.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np

from pvd_tpu.config import PVDConfig
from pvd_tpu.ops.rays import nerf_matrix_to_ngp

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _imread(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if img.shape[-1] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    return img


class NeRFDataset:
    """One split of a blender-format scene.

    Attributes:
      poses: [B, 4, 4] float32 (NGP convention)
      images: [B, H, W, C] float32 in [0,1] (C=3 or 4) or None
      intrinsics: (fx, fy, cx, cy)
      error_map: [B, 128*128] float32 or None
    """

    def __init__(self, cfg: PVDConfig, split: str = "train", downscale: int = 1):
        self.cfg = cfg
        self.split = split
        self.downscale = downscale
        self.training = split in ("train", "all", "trainval")
        self.num_rays = cfg.num_rays if self.training else -1
        root = cfg.path

        if cfg.mode != "blender":
            raise NotImplementedError(f"unknown dataset mode: {cfg.mode}")

        transform = self._load_transforms(root, split)

        self.H = int(transform["h"]) // downscale if "h" in transform else None
        self.W = int(transform["w"]) // downscale if "w" in transform else None

        poses, images = [], []
        for f in transform["frames"]:
            fpath = os.path.join(root, f["file_path"])
            if not fpath[-4:].lower() in (".png", ".jpg"):
                fpath += ".png"
            if not os.path.exists(fpath):
                continue
            pose = np.array(f["transform_matrix"], np.float32)
            poses.append(nerf_matrix_to_ngp(pose, scale=cfg.scale))

            img = _imread(fpath)
            if self.H is None:
                self.H = img.shape[0] // downscale
                self.W = img.shape[1] // downscale
            if img.shape[0] != self.H or img.shape[1] != self.W:
                img = cv2.resize(img, (self.W, self.H),
                                 interpolation=cv2.INTER_AREA)
            images.append(img.astype(np.float32) / 255.0)

        if not poses:
            raise RuntimeError(f"no frames found for split '{split}' in {root}")
        self.poses = np.stack(poses)
        self.images = np.stack(images) if images else None
        self.radius = float(np.linalg.norm(self.poses[:, :3, 3], axis=-1).mean())

        self.error_map = (
            np.ones((len(self.poses), 128 * 128), np.float32)
            if (self.training and cfg.error_map)
            else None
        )

        self.intrinsics = self._intrinsics(transform, downscale)

    @staticmethod
    def _load_transforms(root: str, split: str) -> dict:
        if split == "all":
            transform = None
            for p in sorted(glob.glob(os.path.join(root, "*.json"))):
                with open(p) as f:
                    t = json.load(f)
                if transform is None:
                    transform = t
                else:
                    transform["frames"].extend(t["frames"])
            if transform is None:
                raise FileNotFoundError(f"no transforms json in {root}")
            return transform
        if split == "trainval":
            with open(os.path.join(root, "transforms_train.json")) as f:
                transform = json.load(f)
            with open(os.path.join(root, "transforms_val.json")) as f:
                transform["frames"].extend(json.load(f)["frames"])
            return transform
        with open(os.path.join(root, f"transforms_{split}.json")) as f:
            return json.load(f)

    def _intrinsics(self, transform: dict, downscale: int):
        if "fl_x" in transform or "fl_y" in transform:
            fl_x = transform.get("fl_x", transform.get("fl_y")) / downscale
            fl_y = transform.get("fl_y", transform.get("fl_x")) / downscale
        elif "camera_angle_x" in transform or "camera_angle_y" in transform:
            fl_x = fl_y = None
            if "camera_angle_x" in transform:
                fl_x = self.W / (2 * np.tan(transform["camera_angle_x"] / 2))
            if "camera_angle_y" in transform:
                fl_y = self.H / (2 * np.tan(transform["camera_angle_y"] / 2))
            fl_x = fl_x if fl_x is not None else fl_y
            fl_y = fl_y if fl_y is not None else fl_x
        else:
            raise RuntimeError("transforms.json lacks focal length info")
        # quirk kept from provider.py:279-280: cx defaults to H/2, cy to W/2
        cx = transform.get("cx", self.H / 2) / (downscale if "cx" in transform else 1)
        cy = transform.get("cy", self.W / 2) / (downscale if "cy" in transform else 1)
        return np.array([fl_x, fl_y, cx, cy], np.float32)

    def __len__(self):
        return len(self.poses)

    def images_flat(self) -> Optional[np.ndarray]:
        """[B, H*W, C] view for on-device per-step pixel gathers."""
        if self.images is None:
            return None
        B, H, W, C = self.images.shape
        return self.images.reshape(B, H * W, C)

    def replace_poses(self, poses: np.ndarray):
        """Swap in fresh random poses for a distillation epoch
        (distill_mutual/utils.py:723-735). Images become irrelevant."""
        self.poses = poses.astype(np.float32)
