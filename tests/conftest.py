"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of the reference's ddp_sim debugging config
(configs/trainer/ddp_sim.yaml — DDP spawned on CPU): multi-device sharding
paths are exercised without TPU hardware.
"""

import os

# Env-var route (JAX_PLATFORMS/XLA_FLAGS) for the case jax is not yet
# imported. In this sandbox a sitecustomize pre-imports jax and presets
# JAX_PLATFORMS=axon (the TPU tunnel), so we ALSO override via jax.config
# below — backends initialize lazily, so this still wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the fast suite's wall time is dominated by
# CPU XLA compiles (tiny-model graphs recompiled identically every run) —
# measured 13m17s cold vs 6m43s warm. Kept repo-local (gitignored .cache/)
# rather than in the user data dir so the suite never grows state outside
# the checkout; MATCHA_COMPILATION_CACHE=off disables.
from matcha_tpu.utils.utils import enable_compilation_cache  # noqa: E402

# cache_dir wins over the env var inside the helper, so only pass the
# repo-local default when the user didn't set MATCHA_COMPILATION_CACHE
# (preserving the "off" escape hatch).
enable_compilation_cache(
    cache_dir=None if os.environ.get("MATCHA_COMPILATION_CACHE")
    else os.path.join(os.path.dirname(__file__), "..", ".cache", "test_xla_cache"))

# Parity tests compare against torch f32; JAX's default matmul/conv
# precision is bf16-grade (even on CPU), so pin full f32 for tests.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# Per-test wall-clock guard (VERDICT r4 item 6): the slow tier is the only
# evidence for the multi-process/TP/e2e claims, and an unbounded suite lets
# a hang masquerade as "slow". pytest-timeout is not installed in this
# image, so a SIGALRM guard (main-thread, Linux) bounds each test call:
# 300 s for the fast tier, 1800 s for @slow (worst warm-cache slow test is
# ~270 s; cold-cache CPU compiles need the headroom). Override via
# MATCHA_TEST_TIMEOUT_FAST / MATCHA_TEST_TIMEOUT_SLOW; 0 disables.
# Recorded suite budgets live in TODO.md ("make test-full" section).
# ---------------------------------------------------------------------------
import signal  # noqa: E402

_TIMEOUT_FAST = int(os.environ.get("MATCHA_TEST_TIMEOUT_FAST", "300"))
_TIMEOUT_SLOW = int(os.environ.get("MATCHA_TEST_TIMEOUT_SLOW", "1800"))


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    timeout = _TIMEOUT_SLOW if item.get_closest_marker("slow") else _TIMEOUT_FAST
    if timeout <= 0:
        return (yield)

    def _alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded its {timeout}s wall-clock budget "
            f"(per-test guard; raise MATCHA_TEST_TIMEOUT_* if legitimate)")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(timeout)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
