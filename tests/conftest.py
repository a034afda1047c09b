"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup (to register
the TPU tunnel backend), so env vars set here are too late; instead we update
the live jax config before any backend is initialized (SURVEY.md §4:
multi-device tests use ``xla_force_host_platform_device_count`` instead of a
real TPU slice).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"
