"""Test configuration: force CPU with 8 virtual devices and fp64.

Multi-device sharding is exercised on XLA's host-platform device emulation
(SURVEY.md §4: multi-device tests via CPU emulation, not real TPU pods).
Must run before jax initializes its backends, hence env vars at import time.
"""

import os

# force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU via
# tunnel), which must not be used for unit tests
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
