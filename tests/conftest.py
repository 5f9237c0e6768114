"""Test configuration: force CPU with 8 virtual devices (the standard JAX way
to test pjit/shard_map logic without a pod).

Note: the surrounding environment may preload jax with a TPU plugin via
sitecustomize (JAX_PLATFORMS=axon), so setting os.environ here is too late;
jax.config.update works as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() >= 8, "tests need 8 virtual CPU devices"
