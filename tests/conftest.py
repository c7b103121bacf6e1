"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere.
"""

import gc
import os

import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# TB writers spawn event-pump threads per Trainer; across the full suite
# they exhaust threads/fds and SIGABRT the process — keep TB off in tests
os.environ["PVD_DISABLE_TB"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment's site hook force-registers an 'axon' TPU backend and sets
# jax_platforms='axon,cpu' via config (overriding the env var); tests must
# run on the virtual CPU mesh, so override it back after import
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: first-touch primitive compiles dominate CPU test
# time; cache them across runs.  The dir is keyed by this machine's CPU
# model+flags — XLA:CPU AOT executables from a different host are
# unloadable (cpu_aot_loader refuses mismatched tuning features and
# recompiles; mismatched ISA can SIGILL). /tmp survives host changes in
# this pool, and two pool hosts share a flags line, hence model+flags.
from pvd_tpu.utils.misc import cpu_cache_key  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_test_cache_{cpu_cache_key()}")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(autouse=True)
def _close_leaked_trainers():
    """Close any Trainer a test left open (releases TB writers, host-batcher
    threads, and jitted-step caches — the round-2 full-suite SIGABRT)."""
    yield
    try:
        from pvd_tpu.engine.trainer import Trainer
    except Exception:
        return
    if Trainer._instances:
        for tr in list(Trainer._instances):
            try:
                tr.close()
            except Exception:
                pass
    gc.collect()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    Across the full suite the in-memory jit cache accumulates hundreds of
    XLA:CPU executables (every Trainer/step/renderer variant); by
    test_parallel (~95 tests in) the process hard-aborts inside a
    shard_map step (round-3, after the 16-pair matrix landed).  Clearing
    per module bounds live-executable memory; recompiles hit the
    persistent on-disk cache so the time cost is small.  RSS is logged to
    /tmp/pvd_suite_rss.log for leak triage.
    """
    yield
    import jax as _jax

    _jax.clear_caches()
    gc.collect()
    try:
        with open("/proc/self/statm") as f:
            rss_pages = int(f.read().split()[1])
        threads = "?"
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("Threads:"):
                    threads = line.split()[1]
                    break
        nfds = len(os.listdir("/proc/self/fd"))
        with open("/tmp/pvd_suite_rss.log", "a") as f:
            f.write(f"{rss_pages * 4 // 1024} MiB thr={threads} fds={nfds}\n")
    except OSError:
        pass
