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


def cpu_cache_key() -> str:
    """Host key for the XLA:CPU persistent-cache dir.

    Hash the full identifying head of the first /proc/cpuinfo block:
    model name + numeric family/model/stepping/microcode + flags.  Two
    hosts in this pool shared identical model-name+flags lines yet LLVM
    still derived different tuning features (+prefer-no-gather on one,
    not the other — cpu_aot_loader E-logs observed 2026-08-19 loading
    round-3 entries on the round-4 host), so the earlier name+flags key
    under-keyed the cache; stepping/microcode are the remaining host-
    visible discriminators."""
    import hashlib

    keys = ("model name", "cpu family", "model\t", "model:", "stepping",
            "microcode", "flags")
    picked = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of the first processor block
                if any(line.startswith(k) for k in keys):
                    picked.append(line)
    except OSError:
        return "generic"
    return hashlib.sha1("".join(picked).encode()).hexdigest()[:8]


def setup_jax_cache_and_platform():
    """Tool-side jax setup: honor PVD_FORCE_CPU and pick a safe persistent
    compile-cache directory.

    The environment's site hook pins jax_platforms='axon,cpu' via config
    (the JAX_PLATFORMS env var is ignored), so PVD_FORCE_CPU=1 is the only
    reliable CPU switch for tools.  The cache dir must be split by
    platform: XLA:CPU AOT executables are keyed by the COMPILING host's
    CPU flags and SIGILL when loaded on a different host (/tmp can survive
    machine changes), so CPU runs use a cpu-flags-keyed dir while TPU runs
    share /tmp/jax_bench_cache (executables are for the device, not the
    host).
    """
    import jax

    force_cpu = bool(os.environ.get("PVD_FORCE_CPU"))
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
        cache = f"/tmp/jax_test_cache_{cpu_cache_key()}"
    else:
        cache = "/tmp/jax_bench_cache"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache
