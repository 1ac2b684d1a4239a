"""Test configuration: force an 8-device virtual CPU platform.

Tests must not depend on TPU hardware; the distributed tests run on
8 simulated host devices (`XLA_FLAGS=--xla_force_host_platform_device_count=8`),
the TPU-native analog of a fake communication backend (SURVEY.md §4.5).
This must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Hosted TPU images may pre-import jax from a sitecustomize hook (e.g. the
# axon PJRT plugin registration), in which case jax snapshotted
# JAX_PLATFORMS at import time and the env assignment above is too late —
# update the live config so tests really run on the virtual CPU mesh.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

# The test host has a single CPU; compilation dominates test runtime.
# A persistent compilation cache makes re-runs near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/supernet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
