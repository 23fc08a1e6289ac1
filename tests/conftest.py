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

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene

    return load_scene(os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt"))
