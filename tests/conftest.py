"""Test configuration: CPU backend with 8 virtual devices + float64.

Multi-device sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), the standard way to validate pjit/
shard_map layouts without a real pod. x64 is enabled so solver parity tests
can hit the reference's 1e-6 tolerances
(test/PointCloudRegistrationTest.cc:71,115) — the reference solves in double.
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the tunneled
# TPU) and a sitecustomize hook imports jax before this file runs, so the
# env var alone is too late — update jax.config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"
