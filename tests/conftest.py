"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded code paths are
exercised against XLA's host-platform virtual devices instead (the pattern
recommended for testing pjit/shard_map logic).  Must run before jax import.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU: the ambient environment may point JAX_PLATFORMS at a tunnelled
# TPU ("axon"); unit tests must run locally on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize may have pre-initialised a tunnelled TPU
# backend; this re-resolves platforms so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
