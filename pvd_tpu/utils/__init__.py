"""Leaf utilities: metrics, color space, seeding, logging (reference
distill_mutual/utils.py L0 layer)."""

from pvd_tpu.utils.metrics import PSNRMeter, compute_ssim, lpips_available, psnr
from pvd_tpu.utils.misc import linear_to_srgb, seed_everything, srgb_to_linear

__all__ = [
    "PSNRMeter",
    "psnr",
    "compute_ssim",
    "lpips_available",
    "seed_everything",
    "srgb_to_linear",
    "linear_to_srgb",
]
