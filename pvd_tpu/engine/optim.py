"""Optimizer construction.

Replaces torch AdamW + LambdaLR/CosineAnnealingLR + torch_ema
(main_just_train_tea.py:283-296, main_distill_mutual.py:322-348) with optax:

  * AdamW betas (0.9, 0.99), eps 1e-15, weight decay 0.01 (torch default);
  * per-group learning rates via optax.multi_transform driven by the same
    group labels as NeRFNetwork.get_params (models/api.param_group_label) —
    only VM uses the secondary group (color_net + basis_mat at lr2);
  * schedules: teacher exponential decay lr * 0.1^(step/iters); distill
    cosine annealing to eta_min 5e-5 — both applied per group relative to
    that group's initial LR, matching torch scheduler semantics;
  * fix_mlp freezing via a zero-update group;
  * optional EMA of parameters (torch_ema equivalent).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def exp_decay_schedule(init_lr: float, total_iters: int) -> Callable:
    """LambdaLR 0.1^(it/iters) (main_just_train_tea.py:293-296)."""

    def sched(step):
        frac = jnp.minimum(step / total_iters, 1.0)
        return init_lr * 0.1**frac

    return sched


def cosine_schedule(init_lr: float, total_iters: int, eta_min: float = 5e-5
                    ) -> Callable:
    """CosineAnnealingLR to eta_min (main_distill_mutual.py:346-348)."""

    def sched(step):
        t = jnp.clip(step / total_iters, 0.0, 1.0)
        return eta_min + (init_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t))

    return sched


def build_optimizer(
    params,
    label_fn: Callable,
    trainable_fn: Callable,
    schedule_main: Callable,
    schedule_lr2: Callable,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    """AdamW with per-group schedules and optional frozen leaves.

    label_fn(path)->'main'|'head_lr2'; trainable_fn(path)->bool.
    """

    def leaf_label(path, _leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else getattr(p, "idx", p) for p in path
        )
        if not trainable_fn(keys):
            return "frozen"
        return label_fn(keys)

    labels = jax.tree_util.tree_map_with_path(leaf_label, params)

    def adamw(sched):
        # NOTE: optax.flatten looks attractive (fewer per-leaf ops) but
        # measured 7 ms/step SLOWER on the TPU — the ravel/unravel passes
        # over 17.8M params cost far more than the per-leaf op overhead
        return optax.adamw(
            learning_rate=sched, b1=0.9, b2=0.99, eps=1e-15,
            weight_decay=weight_decay,
        )

    return optax.multi_transform(
        {
            "main": adamw(schedule_main),
            "head_lr2": adamw(schedule_lr2),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )


def ema_update(ema_params, params, decay: float):
    """torch_ema-style shadow update after each optimizer step."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
