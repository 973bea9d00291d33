"""Test harness config: force CPU JAX with an 8-device virtual mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh (SURVEY.md §4 implication (e)). Must run before jax import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize imports jax at interpreter startup, so the env var
# alone is too late — update the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

