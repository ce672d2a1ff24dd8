"""Test configuration: force CPU with 8 virtual devices.

Tests run on a virtual 8-device CPU mesh (the standard JAX recipe for
exercising multi-chip sharding without hardware — SURVEY.md §4); the real
TPU chip is reserved for bench.py.  Must run before jax initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: the traversal while-loops are compile-heavy.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vkrt_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu"
# via config.update, which overrides the env var — override it back before
# any backend initialises so tests run on the virtual 8-device CPU mesh and
# the single real TPU chip stays free for bench.py.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
