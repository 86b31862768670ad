"""Test harness: run everything on a virtual 8-device CPU mesh.

Set platform flags before jax is imported anywhere so multi-chip sharding
paths are testable without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU. The session env pins JAX_PLATFORMS to the TPU tunnel and its
# platform plugin ignores the env var, so set it through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on this class
# of box (1 host core; 253 tests, most jit something). First run pays the
# XLA CPU compiles; re-runs load them from disk (fast-gate re-runs are the
# common case while iterating).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CONFILD_TEST_CACHE",
                                 "/tmp/confild_test_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
