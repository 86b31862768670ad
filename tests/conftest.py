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

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
