"""Test configuration: force an 8-device virtual CPU backend.

This is the JAX-native "fake backend" for distributed testing (SURVEY.md §4):
multi-chip sharding logic runs against 8 host-platform devices so the suite
needs neither TPUs nor the 60 GB datasets.

Note: the environment's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS=axon (the TPU tunnel), so setting env vars here is too
late for the platform choice — it must go through jax.config. XLA_FLAGS is
still honored because the CPU client has not been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()
