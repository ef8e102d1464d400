"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the TPU way — with
xla_force_host_platform_device_count — per SURVEY.md §4.

NOTE: this machine's axon TPU plugin force-exports JAX_PLATFORMS=axon from a
sitecustomize, so the env var alone cannot select the CPU backend; use
jax.config.update *before* any backend initialization instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")
