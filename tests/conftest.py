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
# trackers are while_loop-heavy and slow to compile on CPU; cache across
# runs. The dir is keyed by the host CPU's feature flags: XLA:CPU AOT
# executables are machine-specific, and loading one compiled on a
# different host (container migration between rounds) can SIGSEGV in
# compilation_cache.get_executable_and_time (observed r3).
import hashlib

try:
    _flags = next(l for l in open("/proc/cpuinfo")
                  if l.startswith("flags"))
except (OSError, StopIteration):
    _flags = "unknown"
_cache_dir = "/tmp/jax_cache_cpu_" + hashlib.md5(
    _flags.encode()).hexdigest()[:8]
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
# Only JAX-level artifacts in the entries: deserializing the embedded
# XLA:CPU AOT caches segfaulted reproducibly on entry read
# (get_executable_and_time) after host migrations.
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
