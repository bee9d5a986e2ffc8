"""Test configuration: force an 8-device virtual CPU backend.

This is the JAX-native "fake backend" for distributed testing (SURVEY.md §4):
multi-chip sharding logic runs against 8 host-platform devices so the suite
needs neither TPUs nor the 60 GB datasets. Must run before jax is imported
anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
