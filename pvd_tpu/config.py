"""Typed configuration for pvd_tpu.

One dataclass replaces the reference's ~80 argparse flags
(main_just_train_tea.py:15-215, main_distill_mutual.py:43-236) so that the
same names keep working on the CLI while everything downstream consumes a
single typed object.  `ModelSpec` is the frozen (hashable) subset that model
and renderer code closes over as a static jit argument.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Optional, Tuple

MODEL_TYPES = ("hash", "mlp", "vm", "tensors")


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static architecture description for one field network.

    Mirrors the constructor arguments of the reference NeRFNetwork
    (distill_mutual/network.py:12-105) in a hashable form.
    """

    model_type: str = "hash"
    bound: float = 1.0
    sigma_clip_min: float = -2.0
    sigma_clip_max: float = 7.0
    geo_feat_dim: int = 15
    # shared MLP heads (hash/mlp variants)
    num_layers: int = 2
    hidden_dim: int = 64
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    # direction encoder (SH degree 4 -> 16 comps; plenoxels use their own)
    sh_degree: int = 4
    # hash (INGP) encoder: 14 levels x 2ch, base 16, desired res 2048*bound,
    # 2^19 table (distill_mutual/network.py:47-51, tools/encoding.py:57-61)
    hash_num_levels: int = 14
    hash_level_dim: int = 2
    hash_base_res: int = 16
    hash_log2_size: int = 19
    hash_desired_res: int = 2048
    # TPU fast mode: finest N hashed levels use cell-packed storage
    # (1 gather/point/level, same param count; features C0-discontinuous
    # across subpixel-scale cells). 0 = exact reference parity.
    hash_cell_levels: int = 0
    # TPU fast mode for FROZEN models only (the distill teacher): bake all
    # dense levels onto the finest dense lattice so they cost ONE gathered
    # row per point instead of one per level (ops/hashgrid.py
    # build_baked_dense).  Exact for the finest dense level; coarser dense
    # levels are resampled onto the finer lattice.  Ignored unless the
    # params carry an attach_packed-built '_baked' table.
    hash_bake_dense: bool = False
    # gather-path dtype for hash/cell tables (None = float32 rows): bf16
    # rows are 32B and run the v5e gather engine ~1.4x faster; interpolation
    # arithmetic stays f32 either way
    hash_gather_dtype: Optional[str] = None
    # mlp (NeRF) variant: PE 10, 8 layers x 256, skip 3
    pe_multires: int = 10
    nerf_layer_num: int = 8
    nerf_layer_wide: int = 256
    skip: int = 3
    # vm (TensoRF-VM) variant
    vm_sigma_rank: int = 16
    vm_color_rank: int = 48
    vm_resolution: Tuple[int, int, int] = (300, 300, 300)
    # tensors (Plenoxels) variant
    plenoxel_degree: int = 3
    plenoxel_res: Tuple[int, int, int] = (128, 128, 128)
    # background model (bg_radius > 0 enables it)
    bg_radius: float = -1.0
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    # mixed precision for the MLP heads / basis matmuls ("float32"|"bfloat16");
    # params and compositing stay fp32 (replaces the reference's fp16 AMP)
    compute_dtype: str = "float32"

    def __post_init__(self):
        assert self.model_type in MODEL_TYPES, self.model_type

    @property
    def dir_sh_degree(self) -> int:
        """Direction-encoder SH degree: plenoxels carry their own SH lobe."""
        return self.plenoxel_degree if self.model_type == "tensors" else self.sh_degree

    @property
    def plenoxel_fea_dim(self) -> int:
        return 3 * self.plenoxel_degree**2 + 1


@dataclasses.dataclass(frozen=True)
class RenderSpec:
    """Static renderer settings (NeRFRenderer ctor + march flags)."""

    bound: float = 1.0
    min_near: float = 0.2
    density_thresh: float = 10.0
    density_scale: float = 1.0
    grid_size: int = 128
    dt_gamma: float = 0.0
    max_steps: int = 1024  # lattice length (cuda-ray max march steps)
    max_samples: int = 96  # S_max: padded per-ray sample budget (≈ mean_count)
    # non-grid stratified path
    num_steps: int = 512
    upsample_steps: int = 0
    bg_radius: float = -1.0
    # probe marching (single-cascade, dt_gamma==0): ONE packed-neighborhood
    # gather per `probe_stride` lattice points resolves the exact occupancy
    # of the whole window (the 9^3-bit masks in OccupancyState); stride is
    # auto-clamped so a window never leaves the probe's +-R-cell reach
    # (R = occupancy.NEIGHBOR_RADIUS)
    coarse_march: bool = True
    probe_stride: int = 32
    # legacy two-stage dilated path (multi-cascade fallback)
    coarse_stride: int = 8
    # global valid-sample compaction: field networks run on the first
    # round(samples_per_ray * n_rays) valid samples of the batch instead of
    # the padded [N, max_samples] block (0 = off).  The analog of the
    # reference's mean_count point-buffer cap (raymarching.py:233-238).
    samples_per_ray: float = 0.0

    @property
    def cascades(self) -> int:
        return 1 + max(0, math.ceil(math.log2(self.bound)))

    @property
    def use_coarse_march(self) -> bool:
        return (
            self.coarse_march and self.dt_gamma == 0.0 and self.cascades == 1
        )

    @property
    def effective_probe_stride(self) -> int:
        """Largest power-of-two stride <= probe_stride whose window half-span
        (stride/2 * dt_min) stays within the D-cell supercell-apron reach
        (D = occupancy.SUPER_D; |a-b| <= D cells exactly bounds the
        floor-cell delta by D since D is an integer)."""
        from pvd_tpu.render.occupancy import SUPER_D

        dt_min = 2.0 * math.sqrt(3.0) / self.max_steps
        cell = 2.0 * min(1.0, self.bound) / self.grid_size
        f = 1
        while (
            f * 2 <= self.probe_stride
            and f * 2 <= self.max_steps
            and (f * 2) / 2.0 * dt_min <= SUPER_D * cell
            and self.max_steps % (f * 2) == 0
        ):
            f *= 2
        return f

    def sample_budget(self, n_rays: int) -> int:
        """Static compacted-point count for a batch (multiple of 128)."""
        if self.samples_per_ray <= 0:
            return 0
        m = int(round(n_rays * self.samples_per_ray))
        m = max(128, (m + 127) // 128 * 128)
        return min(m, n_rays * self.max_samples)


@dataclasses.dataclass
class PVDConfig:
    """Full experiment configuration (CLI-parity with the reference mains)."""

    path: str = ""
    workspace: str = "workspace"
    seed: int = 0
    # training
    iters: int = 40000
    lr: float = 1e-2
    ckpt: str = "latest"
    num_rays: int = 8192
    max_steps: int = 1024
    num_steps: int = 512
    upsample_steps: int = 0
    update_extra_interval: int = 16
    max_ray_batch: int = 4096
    precision: str = "bf16"  # replaces --fp16 AMP; bf16 needs no GradScaler
    # data
    mode: str = "blender"
    color_space: str = "srgb"
    preload: bool = True
    bound: float = 1.0
    scale: float = 0.8
    dt_gamma: float = 0.0
    min_near: float = 0.2
    density_thresh: float = 10.0
    bg_radius: float = -1.0
    grid_size: int = 128
    error_map: bool = False
    # <0 no random-pose augmentation; 0 only random orbit poses; >0 inject
    # one orbit pose per `rand_pose` scheduled poses (distillation only —
    # the reference's teacher-side use requires its disabled CLIP loss,
    # distill_mutual/utils.py:666-671)
    rand_pose: int = -1
    data_type: str = "synthetic"  # synthetic | llff | tank
    downscale: int = 1
    # model
    model_type: str = "hash"
    teacher_type: str = "hash"
    sigma_clip_min: float = -2.0
    sigma_clip_max: float = 7.0
    PE: int = 10
    nerf_layer_num: int = 8
    nerf_layer_wide: int = 256
    skip: int = 3
    resolution0: int = 300
    resolution1: int = 300
    upsample_model_steps: Tuple[int, ...] = ()
    plenoxel_degree: int = 3
    plenoxel_res: Tuple[int, int, int] = (128, 128, 128)
    # distillation
    distill_mode: str = "no_fix_mlp"  # fix_mlp | no_fix_mlp
    stage1_iters: int = 2000
    stage2_iters: int = 5000
    loss_type: str = "L2"  # L2 | normL2 | normL1 | smoothL1
    loss_rate_rgb: float = 1.0
    loss_rate_fea_sc: float = 0.002
    loss_rate_color: float = 0.002
    loss_rate_sigma: float = 0.002
    l1_reg_weight: float = 1e-4
    ema_decay: float = -1.0
    ckpt_teacher: str = ""
    ckpt_student: str = ""
    update_stu_extra: bool = False  # refresh student occupancy in distill
    enable_edit_plenoxel: bool = False  # plenoxel region-erase demo
    # TPU-specific
    max_samples: int = 96  # padded per-ray sample budget (see RenderSpec)
    # global sample budget: field networks run on the first
    # round(samples_per_ray * num_rays) valid samples per batch (the
    # mean_count cap analog; 0 disables compaction).  16 is ~2x the
    # measured batch mean on trained occupancy grids.
    samples_per_ray: float = 16.0
    # adapt max_samples / samples_per_ray buckets to measured occupancy
    # stats during training (the reference's mean_count auto-tuning analog)
    autotune_budget: bool = True
    # data parallelism over the ray axis: 1 = single chip, 0 = all local
    # devices, >1 = that many devices (parallel/dp.py shard_map steps)
    n_devices: int = 1
    # TPU extension: fuse K train steps into ONE lax.scan dispatch
    # (amortizes the ~1.2 ms/step host+tunnel overhead measured on
    # v5e-via-axon).  Composes with --error_map (the device-resident map
    # rides the scan carry) and with DP meshes; only the host-batcher
    # path (preload=False) forces single steps.  Steps that straddle a
    # stage boundary, occupancy-update tick, or VM upsample fall back to
    # single dispatches.  0/1 = off.
    scan_steps: int = 0
    hash_cell_levels: int = 0  # finest hashed levels in cell-packed fast mode
    hash_bake_dense: bool = False  # bake frozen-teacher dense levels into 1 row
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> all local devices
    eval_interval: int = 50
    # graceful wall-clock budget for Trainer.train (seconds; 0 = unlimited).
    # When exhausted the run ends early AT AN EPOCH BOUNDARY with the normal
    # end-of-training checkpoint + eval, instead of overrunning — needed on
    # the shared axon TPU where a training process must never be killed.
    wall_budget: float = 0.0
    # TensorBoard event writing (tensorboardX spawns event-pump threads per
    # writer; tests set this False — or PVD_DISABLE_TB=1 — to avoid thread
    # exhaustion across many Trainer instances in one process)
    tensorboard: bool = True

    def __post_init__(self):
        if isinstance(self.plenoxel_res, str):
            self.plenoxel_res = tuple(json.loads(self.plenoxel_res))
        self.plenoxel_res = tuple(self.plenoxel_res)
        self.upsample_model_steps = tuple(self.upsample_model_steps)
        # The reference multiplies lr by 0.1 for the mlp architecture
        # (main_just_train_tea.py:225-226); we keep that in the CLI layer.

    # ---- derived specs -------------------------------------------------
    def model_spec(self, model_type: Optional[str] = None) -> ModelSpec:
        return ModelSpec(
            model_type=model_type or self.model_type,
            compute_dtype="bfloat16" if self.precision == "bf16" else "float32",
            hash_cell_levels=self.hash_cell_levels,
            hash_bake_dense=self.hash_bake_dense,
            # measured on v5e: bf16 table rows gather 2x SLOWER than f32
            # (the engine punishes sub-word rows), so this stays None
            hash_gather_dtype=None,
            bound=self.bound,
            sigma_clip_min=self.sigma_clip_min,
            sigma_clip_max=self.sigma_clip_max,
            pe_multires=self.PE,
            nerf_layer_num=self.nerf_layer_num,
            nerf_layer_wide=self.nerf_layer_wide,
            skip=self.skip,
            vm_resolution=(self.resolution0,) * 3,
            plenoxel_degree=self.plenoxel_degree,
            # plenoxel coarse-to-fine (round 5): with an upsample schedule
            # the dense volume starts at resolution0^3 and trilinear-
            # upsamples through the same log schedule VM students use
            # (Trainer._maybe_vm_resize); plenoxel_res is the static
            # (reference-default 128^3) resolution otherwise
            plenoxel_res=((self.resolution0,) * 3
                          if (self.model_type == "tensors"
                              and self.upsample_model_steps)
                          else tuple(self.plenoxel_res)),
            bg_radius=self.bg_radius,
        )

    def render_spec(self) -> RenderSpec:
        return RenderSpec(
            bound=self.bound,
            min_near=self.min_near,
            density_thresh=self.density_thresh,
            grid_size=self.grid_size,
            dt_gamma=self.dt_gamma,
            max_steps=self.max_steps,
            max_samples=self.max_samples,
            samples_per_ray=self.samples_per_ray,
            num_steps=self.num_steps,
            upsample_steps=self.upsample_steps,
            bg_radius=self.bg_radius,
        )

    # ---- (de)serialization (replaces args.txt round-trip) --------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "PVDConfig":
        raw = json.loads(text)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})
