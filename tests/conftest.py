"""Test configuration: force an 8-device virtual CPU mesh.

IMPORTANT: in this environment a sitecustomize hook imports jax at
interpreter startup, so JAX_PLATFORMS env overrides set afterwards are
ignored — `jax.config.update` after import is the only reliable override.
Tests never touch the real TPU; multi-chip sharding is validated on the
virtual CPU mesh (SURVEY.md §4).
"""

import os

# XLA_FLAGS is read at backend *initialization* (not import), so this still
# takes effect as long as no backend has been created yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", \
    "tests must run on the virtual CPU mesh, not the TPU tunnel"
assert jax.device_count() == 8
