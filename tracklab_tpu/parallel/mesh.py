"""Device-mesh parallelism.

The reference has **no** distributed runtime (SURVEY §2.7 — zero
torch.distributed/NCCL/MPI anywhere); its concurrency is DataLoader workers
+ multiprocessing pools. The TPU-native replacement implemented here:

  * **dp** — batch data parallelism for model inference/training:
    batch axis sharded over the ``dp`` mesh axis, gradients reduced by XLA
    collectives over ICI (no hand-written NCCL).
  * **tp** — tensor parallelism for the detector/ReID convs and dense
    heads: output-channel dims of large kernels sharded over ``tp``; GSPMD
    propagates the sharding and inserts all-gathers/reduce-scatters.
  * **video-dp** — the workload's native outer axis: videos are
    embarrassingly parallel (BASELINE config 5: 8 videos on a v4-8), so the
    tracker scan is sharded over the video axis with ``shard_map``; each
    device runs its own lax.scan sequentially, no cross-talk.
  * pp/sp/ep — not applicable by the reference's semantics (no pipeline
    stages, no experts; "sequence" here is video time, which stays
    device-local inside each scan). The long-video fallback is chunked
    scan with carried state (see trackers/*.py), not ring attention.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_params_tp", "shard_batch_dp",
           "tracker_videos_sharded"]


def make_mesh(n_devices: int | None = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              tp_size: int | None = None) -> Mesh:
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if tp_size is None:
        tp_size = 2 if n % 2 == 0 and n >= 2 else 1
    dp = n // tp_size
    arr = np.array(devices).reshape(dp, tp_size)
    return Mesh(arr, axis_names=tuple(axis_names))


def shard_params_tp(params, mesh: Mesh, min_channels: int = 64):
    """NamedShardings for a Flax param pytree: shard the output-channel
    dim of large conv/dense kernels over 'tp'; replicate the rest."""
    tp = mesh.shape["tp"]

    def rule(path, leaf):
        if leaf.ndim >= 2 and leaf.shape[-1] >= min_channels \
                and leaf.shape[-1] % tp == 0:
            spec = [None] * (leaf.ndim - 1) + ["tp"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch_dp(batch, mesh: Mesh):
    """Shard leading batch axis over 'dp', replicate over 'tp'."""
    def rule(leaf):
        spec = ["dp"] + [None] * (leaf.ndim - 1)
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(rule, batch)


def tracker_videos_sharded(scan_fn, cfg, mesh: Mesh,
                           axis: str = "dp"):
    """Build a jitted multi-video tracker: detections pytrees with a
    leading video axis are sharded over ``axis``; each device runs its own
    sequential lax.scan (videos are independent — no collectives on the
    hot path)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def per_shard(dets):
        return jax.vmap(lambda d: scan_fn(cfg, d))(dets)

    spec = P(axis)
    try:  # jax >= 0.8 tracks varying-manual-axes; our carries start
        # replicated and become shard-varying, which is intended
        fn = jax.jit(shard_map(per_shard, mesh=mesh, in_specs=spec,
                               out_specs=spec, check_vma=False))
    except TypeError:
        fn = jax.jit(shard_map(per_shard, mesh=mesh, in_specs=spec,
                               out_specs=spec, check_rep=False))

    def run(dets_batched):
        sharding = NamedSharding(mesh, spec)
        dets_batched = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), dets_batched)
        return fn(dets_batched)

    return run


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host (DCN) initialization for video-level data parallelism
    across hosts (SURVEY §2.7: per-host video subsets; only eval
    reductions cross hosts). Thin wrapper over jax.distributed —
    harmless no-op on a single host."""
    import jax
    if num_processes in (None, 0, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True
