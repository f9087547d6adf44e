"""Shared tracker plumbing: padded detection batches and slot allocation.

The reference trackers carry Python lists of track objects with dynamic
birth/death (e.g. plugins/track/oc_sort/ocsort.py:203-334). TPU-native
design replaces them with fixed-capacity slot arrays + active masks; births
claim free slots in detection order (preserving the reference's id-assignment
order) and deaths just clear the mask.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["Detections", "pad_detections", "claim_slots", "cumsum_rank"]


class Detections(NamedTuple):
    """One frame of detections, padded to a fixed capacity D.

    ltrb:  (D, 4) float boxes
    conf:  (D,) float scores
    cls:   (D,) float category ids
    ref:   (D,) int32 caller-side row ids (the reference's "tracklab_id",
           used to join tracker output back onto the detection DataFrame)
    valid: (D,) bool
    """
    ltrb: jnp.ndarray
    conf: jnp.ndarray
    cls: jnp.ndarray
    ref: jnp.ndarray
    valid: jnp.ndarray


def pad_detections(ltrb, conf, cls=None, ref=None, capacity=64,
                   dtype=np.float32) -> Detections:
    """Host-side helper: ragged numpy detections -> fixed-capacity pytree."""
    n = min(len(ltrb), capacity)
    out_ltrb = np.zeros((capacity, 4), dtype)
    out_conf = np.zeros((capacity,), dtype)
    out_cls = np.zeros((capacity,), dtype)
    out_ref = np.full((capacity,), -1, np.int32)
    valid = np.zeros((capacity,), bool)
    out_ltrb[:n] = np.asarray(ltrb, dtype)[:n]
    out_conf[:n] = np.asarray(conf, dtype)[:n]
    if cls is not None:
        out_cls[:n] = np.asarray(cls, dtype)[:n]
    out_ref[:n] = (np.asarray(ref, np.int32)[:n] if ref is not None
                   else np.arange(n, dtype=np.int32))
    valid[:n] = True
    return Detections(jnp.asarray(out_ltrb), jnp.asarray(out_conf),
                      jnp.asarray(out_cls), jnp.asarray(out_ref),
                      jnp.asarray(valid))


def cumsum_rank(mask):
    """Rank of each True element among True elements (0-based), int32."""
    return jnp.cumsum(mask.astype(jnp.int32), dtype=jnp.int32) - 1


def claim_slots(free_slots: jnp.ndarray, want: jnp.ndarray):
    """Assign free track slots to birth candidates in order.

    Args:
      free_slots: (T,) bool — slots available for new tracks.
      want: (D,) bool — detections that should found a new track, in
        detection order (matching the reference's sequential id assignment,
        ocsort.py:311-314).
    Returns:
      det2slot: (D,) int32 — slot index per candidate, -1 if out of capacity.
    """
    T = free_slots.shape[0]
    slot_rank = cumsum_rank(free_slots)            # nth free slot
    # slot index of the k-th free slot: scatter ranks -> slots
    nth_free = jnp.full(T + 1, -1, jnp.int32)
    tgt = jnp.where(free_slots, slot_rank, T)
    nth_free = nth_free.at[tgt].set(jnp.arange(T, dtype=jnp.int32))
    n_free = jnp.sum(free_slots, dtype=jnp.int32)
    want_rank = cumsum_rank(want)                  # nth birth candidate
    ok = want & (want_rank < n_free)
    det2slot = jnp.where(ok, nth_free[jnp.clip(want_rank, 0, T)], -1)
    return det2slot


def birth_scatter(det2slot, birth, arr, val):
    """Write ``val[d]`` into ``arr[det2slot[d]]`` for each birth det —
    as a one-hot masked sum instead of a per-row scatter (scatters
    lower poorly on TPU; small D x T broadcasts are VPU friendly).
    arr (T, ...), val (D, ...), det2slot (D,) int32, birth (D,) bool.
    Slots are claimed at most once (claim_slots), so the one-hot rows
    are disjoint and the sum is exact for every dtype."""
    T = arr.shape[0]
    sel = (det2slot[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]) \
        & birth[:, None]                               # (D, T)
    claimed = jnp.any(sel, axis=0)                     # (T,)
    expand = (slice(None), slice(None)) + (None,) * (arr.ndim - 1)
    sel_e = sel[expand]                                # (D, T, 1...)
    val_e = val[:, None]                               # (D, 1, ...)
    if arr.dtype == jnp.bool_:
        picked = jnp.any(sel_e & val_e, axis=0)
    else:
        picked = jnp.where(sel_e, val_e,
                           jnp.zeros((), arr.dtype)).sum(axis=0)
    cl = claimed[(slice(None),) + (None,) * (arr.ndim - 1)]
    return jnp.where(cl, picked.astype(arr.dtype), arr)


def reset_wrapped_step(step_fn, init_state):
    """Wrap a tracker scan step with a per-frame state reset.

    The TPU-native single-chip multi-video mode: V videos concatenate
    along TIME into one stream with ``reset[t]=True`` at each video's
    first frame; the carry re-initializes there, so every segment is
    bit-identical to its own single-video scan — and the scan keeps its
    data-dependent ``lax.cond`` fast paths, which ``vmap`` would
    otherwise degrade (every branch runs for all lanes; measured 12x on
    the cond cliff, and 40x worse with cond-free per-frame JV solves on
    real TPU — BASELINE.md).

    step_fn: (state, x) -> (state, out). Returns a step over
    ``(x, reset)`` inputs.
    """
    import jax

    def step(carry, inp):
        x, reset = inp
        carry = jax.tree_util.tree_map(
            lambda i, c: jnp.where(
                jnp.reshape(reset, (1,) * c.ndim), i, c),
            init_state, carry)
        return step_fn(carry, x)

    return step


def concat_resets(n_videos: int, n_frames: int):
    """(V*T,) bool mask marking each video's first frame in a
    time-concatenated stream."""
    r = jnp.zeros((n_videos, n_frames), bool)
    return r.at[:, 0].set(True).reshape(-1)
