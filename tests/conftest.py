"""Test harness: force an 8-device CPU platform so multi-chip sharding logic
is exercised without TPU hardware (SURVEY.md §4 test strategy).

The session environment registers an 'axon' TPU PJRT plugin for every Python
process via sitecustomize and pins JAX_PLATFORMS=axon; the single TPU chip is
exclusive, so tests must not touch it. The plugin is only *registered* at
interpreter start — backend init is lazy — so overriding jax's platform
config here, before any jax operation runs, keeps tests on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU platform"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"
