"""Test harness configuration.

Forces the CPU backend with 8 virtual devices so multi-chip sharding
tests run anywhere (SURVEY.md §4: multi-host tests via
``xla_force_host_platform_device_count``), and enables the persistent
compilation cache to keep repeated test runs fast.
"""

import os
import sys

# Must be set before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize registers the tunneled TPU backend and forces
# jax_platforms="axon,cpu" regardless of the env var. Neutralize BOTH
# ways: drop the trigger env so child processes stay clean, and override
# the config before any backend is touched. Without this, "CPU" tests
# silently run over the TPU tunnel (slow, flaky, 1 device).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import pytest  # noqa: E402
import signal  # noqa: E402

# Per-test hang guard. pytest-timeout is not in the baked environment,
# so use SIGALRM directly: a single stuck compile/collective would
# otherwise eat the whole CI budget. Won't fire inside C code holding
# the GIL, but covers the realistic hangs (while_loop livelock, tunnel
# stall surfacing as a Python-level wait).
_TEST_TIMEOUT_S = int(os.environ.get("KDPT_TEST_TIMEOUT", "600"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    if _TEST_TIMEOUT_S <= 0 or not hasattr(signal, "SIGALRM"):
        yield
        return

    def _alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded the {_TEST_TIMEOUT_S}s hang guard "
            "(KDPT_TEST_TIMEOUT to adjust)"
        )

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(_TEST_TIMEOUT_S)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def cornell_scene():
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene

    return load_scene(os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt"))
