"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This is the JAX-idiomatic "fake multi-device" setup the reference lacks
(SURVEY.md §4): all sharding/pjit tests run against 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache makes repeat test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
