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
# NO persistent compilation cache for tests: loading cached XLA:CPU AOT
# executables segfaults sporadically in this environment
# (compilation_cache.get_executable_and_time — machine-feature-sensitive
# deserialization; reproduced across cache configurations, r3). Cold
# compiles are absorbed by running the suite with pytest -n 4
# --dist loadfile (xdist), which also isolates any residual crash to
# one worker instead of killing the run.
