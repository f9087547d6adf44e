"""Time-axis sharding: split one video's frame axis across the mesh.

SURVEY §5 "long-context" note: this workload's sequence length is video
length, and the only cross-frame-adjacent computation in the whole
pipeline is the GMC/ECC frame-pair warp (everything else is per-frame —
detector, pose, ReID — or a carried-state scan that stays on one device).
So the entire "sequence parallelism" story is:

  * per-frame stages: shard the time axis like a batch axis
    (:func:`frames_time_sharded`) — no collectives at all;
  * GMC warps: each device computes warps for its own frame slice and
    needs exactly one halo frame (its left neighbor's last frame) via a
    single ``ppermute`` (:func:`gmc_warps_time_sharded`).

Reference counterpart: bot_sort/gmc.py + deep_oc_sort/cmc.py compute
warps serially on the host; here a v4-8 slices a long video 8-way and
pays one ICI hop total.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from tracklab_tpu.motion.lk_jax import estimate_affine_lk

__all__ = ["frames_time_sharded", "gmc_warps_time_sharded"]


def _shard_mapped(fn, mesh, spec):
    try:
        return jax.jit(shard_map(fn, mesh=mesh, in_specs=spec,
                                 out_specs=spec, check_vma=False))
    except TypeError:
        return jax.jit(shard_map(fn, mesh=mesh, in_specs=spec,
                                 out_specs=spec, check_rep=False))


def frames_time_sharded(per_frame_fn, mesh: Mesh, axis: str = "dp"):
    """Run a per-frame function over a (F, ...) frame stack with the time
    axis sharded over ``axis``. F must divide by the axis size."""

    def per_shard(frames):
        return jax.vmap(per_frame_fn)(frames)

    fn = _shard_mapped(per_shard, mesh, P(axis))

    def run(frames):
        frames = jax.device_put(frames, NamedSharding(mesh, P(axis)))
        return fn(frames)

    return run


def gmc_warps_time_sharded(mesh: Mesh, axis: str = "dp",
                           levels: int = 3, iters: int = 10):
    """Build a jitted (F, H, W[, 3]) -> (F, 2, 3) GMC warp estimator with
    the time axis sharded over ``axis``.

    warp[t] maps frame t-1 coords to frame t coords (warp[0] = identity,
    the GMC convention). Each device handles F/n consecutive frames; the
    pair (t-1, t) at each shard boundary needs the left neighbor's last
    frame — fetched with one ppermute (the halo exchange)."""
    identity = jnp.eye(2, 3, dtype=jnp.float32)

    def per_shard(frames):
        # frames: (F/n, H, W[, 3]) local slice
        idx = jax.lax.axis_index(axis)
        n = jax.lax.axis_size(axis)
        last = frames[-1]
        # left neighbor's last frame (device i receives from i-1)
        halo = jax.lax.ppermute(
            last, axis, [(i, (i + 1) % n) for i in range(n)])
        prevs = jnp.concatenate([halo[None], frames[:-1]], axis=0)
        warps = jax.vmap(
            lambda p, c: estimate_affine_lk(p, c, levels=levels,
                                            iters=iters))(prevs, frames)
        # global frame 0 has no predecessor -> identity
        first_global = (idx == 0)
        warps = warps.at[0].set(
            jnp.where(first_global, identity, warps[0]))
        return warps

    fn = _shard_mapped(per_shard, mesh, P(axis))

    def run(frames):
        frames = jax.device_put(frames, NamedSharding(mesh, P(axis)))
        return fn(frames)

    return run
