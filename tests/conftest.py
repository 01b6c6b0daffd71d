"""Test configuration: force CPU with 8 virtual devices (the JAX 'fake
cluster') so multi-chip sharding tests run anywhere, per SURVEY.md §4.

The axon sitecustomize registers the tunneled TPU whenever
PALLAS_AXON_POOL_IPS is set and overrides JAX_PLATFORMS — clear it before
anything imports jax so tests stay on the virtual CPU mesh.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the sitecustomize may have pinned jax_platforms before this file runs;
# the backend is not initialized yet, so this override still lands
jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

jax.config.update("jax_default_matmul_precision", "highest")
