"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Mirrors the reference's test strategy of disabling the compiled kernels
(reference tests/conftest.py:7 sets numba DISABLE_JIT): we run everything
on CPU with float64 so numerics are exact, and expose 8 virtual devices so
multi-chip sharding tests run without TPU hardware.
"""

import os
import sys

# force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# which lacks float64/complex128 and pays a remote compile round trip per op
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the environment's jax is patched to prepend the "axon" TPU-tunnel platform
# regardless of JAX_PLATFORMS, so pin the platform list explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
