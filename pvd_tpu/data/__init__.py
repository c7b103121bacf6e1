"""Dataset loading and pose synthesis (reference provider.py + the
random-pose distillation samplers in distill_mutual/utils.py:67-198)."""

from pvd_tpu.data.provider import NeRFDataset
from pvd_tpu.data.poses import get_rand_poses, pose_spherical, rand_orbit_poses

__all__ = ["NeRFDataset", "get_rand_poses", "pose_spherical", "rand_orbit_poses"]
