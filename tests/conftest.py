"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (the standard fake-cluster
technique for exercising multi-chip sharding without hardware) and with x64
enabled, because trajectory-parity tests compare against the f64 scipy-based
reference.  These env vars must be set before jax is first imported, which is
why they live at conftest import time.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "true"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sgt_jax_cache")

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform regardless of env
# vars; config.update after import reliably pins tests to the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache across test processes (compiles dominate runtime).
jax.config.update("jax_compilation_cache_dir", "/tmp/sgt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
