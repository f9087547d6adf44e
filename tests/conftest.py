"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never require a real TPU. Multi-chip sharding paths are validated on
virtual CPU devices (``xla_force_host_platform_device_count=8``); numeric
parity tests enable x64 so the float64 reference oracles match tightly.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may have imported jax already (axon sitecustomize), in
# which case the env var is snapshotted; the config update still wins as
# long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the JV assignment solver and scan-based
# trackers are while_loop-heavy and slow to compile on CPU; cache across runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
