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
# persistent compilation cache: the suite is compile-dominated on CPU;
# warm-cache reruns skip most of it
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()
