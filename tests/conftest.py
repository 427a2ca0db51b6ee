"""Test config: run everything on CPU with 8 virtual devices so mesh/sharding
tests work without TPU hardware (the JAX-idiomatic multi-chip-without-a-cluster
mechanism; SURVEY.md section 4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config knob works.
jax.config.update("jax_platforms", "cpu")
