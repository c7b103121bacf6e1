"""Teacher training CLI (reference main_just_train_tea.py).

Usage:
  python -m pvd_tpu.cli.train_teacher <data_path> --model_type hash \
      --workspace ws_hash [--iters 40000 --num_rays 8192 ...]
  python -m pvd_tpu.cli.train_teacher <data_path> --test --workspace ws_hash
"""

from __future__ import annotations

import sys

from pvd_tpu.cli.common import base_parser, finalize_run, to_config, write_args_txt
from pvd_tpu.data.provider import NeRFDataset
from pvd_tpu.engine.trainer import Trainer
from pvd_tpu.utils import seed_everything


def main(argv=None):
    args = base_parser(distill=False).parse_args(argv)
    cfg = to_config(args)
    seed_everything(cfg.seed)

    trainer = Trainer(cfg, mode="teacher")

    if args.test:
        if not trainer.try_resume() and cfg.ckpt_student:
            trainer.load_student(cfg.ckpt_student)
        test_ds = NeRFDataset(cfg, "test", downscale=cfg.downscale)
        # pre-eval grid refresh gated exactly like the reference
        # (just_train_tea/utils.py:1204-1211: only under update_stu_extra)
        trainer.evaluate(test_ds, write_video=True,
                         refresh_occ=cfg.update_stu_extra)
        return trainer.stats

    write_args_txt(cfg, cfg.workspace)
    train_ds = NeRFDataset(cfg, "train", downscale=cfg.downscale)
    if cfg.ckpt == "latest":
        trainer.try_resume()

    # VM progressive upsample schedule: log-spaced resolution0->resolution1
    # (main_just_train_tea.py:320-334)
    from pvd_tpu.cli.common import upsample_schedule

    trainer.upsample_resolutions = upsample_schedule(cfg)

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
