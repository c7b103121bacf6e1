"""Training engine: optimizers, jitted train steps, the Trainer orchestrator,
checkpointing (reference L5 layer: just_train_tea/utils.py:366-1259 and
distill_mutual/utils.py:532-1725)."""

from pvd_tpu.engine.trainer import Trainer

__all__ = ["Trainer"]
