"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU; multi-chip sharding is validated on a
virtual CPU mesh (xla_force_host_platform_device_count), per the project's
distributed test strategy (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env ships JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
