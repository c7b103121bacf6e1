"""Small helpers (seed_everything, color space; utils.py:209-216, 407-414)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


def srgb_to_linear(x):
    import jax.numpy as jnp

    return jnp.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    import jax.numpy as jnp

    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)
