"""Test harness: force an 8-device virtual CPU mesh before any backend
initializes.

This is the JAX-idiomatic "fake multi-device" setup the reference lacks
(SURVEY.md §4): all sharding/pjit tests run against 8 virtual CPU devices.
Note: a pytest plugin imports jax before this conftest runs, so the ambient
JAX_PLATFORMS=axon is already captured as the config default — we must
override through jax.config, not os.environ.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache makes repeat test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
