"""Test configuration.

Forces JAX onto the host CPU platform with 8 virtual devices so that all
multi-chip sharding logic (data-parallel batch sharding, model-parallel
kernel sharding) is exercised without TPU hardware. This is the fake-backend
layer the reference lacks (SURVEY.md section 4).

Note: this environment's sitecustomize imports jax at interpreter startup
(with JAX_PLATFORMS=axon latched), so env vars set here are too late for the
platform choice — we use jax.config.update instead. XLA backend init is lazy,
so the XLA_FLAGS device-count flag still takes effect as long as no
jax.devices() call has happened yet.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: extended_gan_tpu/__init__.py already points
# every process (tests included) at ~/.cache/egt_jax_cache. For the suite,
# lower the persistence threshold: the CPU tier compiles hundreds of
# 0.1-1 s programs whose aggregate dominates cold-cache wall time.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
