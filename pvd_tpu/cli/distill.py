"""Any-to-any distillation CLI (reference main_distill_mutual.py).

Usage:
  python -m pvd_tpu.cli.distill <data_path> --teacher_type hash \
      --model_type vm --ckpt_teacher ws_hash/checkpoints/hash_best.ckpt \
      --workspace ws_h2v [--stage_iters stage1=2000,stage2=5000 ...]
  python -m pvd_tpu.cli.distill <data_path> --test --workspace ws_h2v
  python -m pvd_tpu.cli.distill <data_path> --test_teacher ...
"""

from __future__ import annotations

import sys

from pvd_tpu.cli.common import (
    base_parser,
    finalize_run,
    save_codes_env,
    to_config,
    write_args_txt,
)
from pvd_tpu.data.provider import NeRFDataset
from pvd_tpu.engine.trainer import Trainer
from pvd_tpu.utils import seed_everything


def parse_stage_iters(text: str):
    """'stage1=2000,stage2=5000' (the reference eval()s a dict literal,
    main_distill_mutual.py:233-238; we parse k=v pairs instead)."""
    out = {"stage1": 2000, "stage2": 5000}
    if text:
        text = text.strip("{} ")
        for part in text.replace("'", "").replace('"', "").split(","):
            if not part:
                continue
            k, v = part.split("=") if "=" in part else part.split(":")
            out[k.strip()] = int(v)
    return out


def main(argv=None):
    parser = base_parser(distill=True)
    parser.add_argument("--stage_iters", type=str, default="",
                        help="stage1=2000,stage2=5000")
    parser.add_argument("--test_type_trainval", action="store_true")
    parser.add_argument("--load_args", type=str, default="")
    args = parser.parse_args(argv)
    cfg = to_config(args)

    if args.load_args:
        # re-hydrate config from a previous run (reference load_from_txt)
        from pvd_tpu.config import PVDConfig

        with open(args.load_args) as f:
            cfg = PVDConfig.from_json(f.read().split("\n//")[0])

    stages = parse_stage_iters(args.stage_iters)
    cfg.stage1_iters = stages["stage1"]
    cfg.stage2_iters = stages["stage2"]
    # plenoxels have no separable feature: stage 1 is disabled when either
    # side is 'tensors' (main_distill_mutual.py:243-246)
    if "tensors" in (cfg.model_type, cfg.teacher_type):
        cfg.stage1_iters = 0

    seed_everything(cfg.seed)
    trainer = Trainer(cfg, mode="distill")

    if args.test or args.test_teacher or args.test_type_trainval:
        if cfg.ckpt_teacher:
            trainer.load_teacher(cfg.ckpt_teacher)
        if not args.test_teacher:
            if cfg.ckpt_student:
                trainer.load_student(cfg.ckpt_student)
            else:
                trainer.try_resume()
        split = "trainval" if args.test_type_trainval else "test"
        ds = NeRFDataset(cfg, split, downscale=cfg.downscale)
        # reference refreshes the student grid once before test rendering
        # ONLY under update_stu_extra (distill_mutual/utils.py:1227-1232);
        # otherwise the checkpoint's (teacher-inherited) grid is kept
        trainer.evaluate(ds, use_teacher=args.test_teacher, write_video=True,
                         refresh_occ=cfg.update_stu_extra
                         and not args.test_teacher)
        return trainer.stats

    assert cfg.ckpt_teacher, "--ckpt_teacher is required for distillation"
    write_args_txt(cfg, cfg.workspace)
    save_codes_env(cfg.workspace)
    trainer.load_teacher(cfg.ckpt_teacher)
    if cfg.enable_edit_plenoxel and cfg.teacher_type == "tensors":
        # scene-editing demo: erase a region of the teacher volume before
        # distilling (deletes the lego bucket; network.py:313-316)
        from pvd_tpu.models.tensors_field import edit_erase_region

        trainer.params_tea = edit_erase_region(trainer.params_tea)
        trainer.log("[edit_plenoxel] teacher region erased")
    if cfg.ckpt_student:
        trainer.load_student(cfg.ckpt_student)
    elif cfg.ckpt == "latest":
        trainer.try_resume()

    # VM progressive upsample schedule (main_distill_mutual.py:367-382)
    from pvd_tpu.cli.common import upsample_schedule

    trainer.upsample_resolutions = upsample_schedule(cfg)

    train_ds = NeRFDataset(cfg, "train", downscale=cfg.downscale)
    try:
        valid_ds = NeRFDataset(cfg, "val", downscale=cfg.downscale)
    except Exception:
        valid_ds = None  # dataset has no val split
    trainer.train(train_ds, valid_ds=valid_ds)

    test_ds = NeRFDataset(cfg, "test", downscale=cfg.downscale)
    trainer.evaluate(test_ds, write_video=True)
    finalize_run(trainer, cfg)
    return trainer.stats


if __name__ == "__main__":
    main(sys.argv[1:])
