"""The vmap-safe batched mode must be output-identical to the default
cond-dispatched mode — for the solvers and for every tracker that
exposes ``cfg.batched``.

Background (BASELINE.md): under ``vmap`` over a video axis, ``lax.cond``
runs every branch for all lanes, so the fast-path conds that make
single-video scans quick become pure overhead (the measured 12x
multi-video cliff). ``batched=True`` replaces them with one cond-free
rectangular JV solve.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracklab_tpu.ops.assignment import (
    matching_forced, matching_limit, min_cost_matching,
)
from test_ocsort import synth_stream, CFG_KW
from test_ocsort import run_jax as run_jax_ocsort
from test_strongsort import synth_stream_with_emb, E_DIM


def _totals(cost, r2c):
    m = r2c >= 0
    return int(m.sum()), float(cost[np.nonzero(m)[0], r2c[m]].sum())


@pytest.mark.parametrize("shape", [(8, 16), (16, 8), (12, 12)])
def test_solver_batched_equivalence(shape):
    R, C = shape
    rng = np.random.default_rng(0)
    f_n = jax.jit(lambda c, r, m: matching_forced(c, r, m))
    f_b = jax.jit(lambda c, r, m: matching_forced(c, r, m, batched=True))
    l_n = jax.jit(lambda c, r, m: matching_limit(c, r, m, 0.9))
    l_b = jax.jit(lambda c, r, m: matching_limit(c, r, m, 0.9,
                                                 batched=True))
    m_n = jax.jit(lambda c, r, m: min_cost_matching(c, r, m, 0.7))
    m_b = jax.jit(lambda c, r, m: min_cost_matching(c, r, m, 0.7,
                                                    batched=True))
    for _ in range(40):
        cost = rng.normal(size=(R, C)) * rng.uniform(0.1, 3)
        rm = rng.uniform(size=R) < 0.8
        cm = rng.uniform(size=C) < 0.7
        a, b = np.asarray(f_n(cost, rm, cm)), np.asarray(f_b(cost, rm, cm))
        ca, sa = _totals(cost, a)
        cb, sb = _totals(cost, b)
        assert ca == cb and abs(sa - sb) < 1e-8
        a, b = np.asarray(l_n(cost, rm, cm)), np.asarray(l_b(cost, rm, cm))
        ca, sa = _totals(cost, a)
        cb, sb = _totals(cost, b)
        # equal objective of the cost-limit program (ties may permute)
        assert abs((0.9 * ca - sa) - (0.9 * cb - sb)) < 1e-8
        a, b = np.asarray(m_n(cost, rm, cm)), np.asarray(m_b(cost, rm, cm))
        ca, sa = _totals(cost, a)
        cb, sb = _totals(cost, b)
        assert ca == cb and abs(sa - sb) < 1e-6


def _assert_same(got_a, got_b):
    assert len(got_a) == len(got_b)
    for f, (a, b) in enumerate(zip(got_a, got_b)):
        ids_a = sorted((r[1], r[4]) for r in a)
        ids_b = sorted((r[1], r[4]) for r in b)
        assert ids_a == ids_b, f"frame {f}: {ids_a} != {ids_b}"
        box_a = {r[1]: r[0] for r in a}
        box_b = {r[1]: r[0] for r in b}
        for tid in box_a:
            np.testing.assert_allclose(box_a[tid], box_b[tid], atol=1e-6)


def test_ocsort_batched_mode_identical():
    from tracklab_tpu.trackers.ocsort import OCSortConfig

    frames = synth_stream(3, n_frames=50)
    cfg = OCSortConfig(max_tracks=64, max_dets=32, **CFG_KW)
    a = run_jax_ocsort(frames, cfg)
    b = run_jax_ocsort(frames, dataclasses.replace(cfg, batched=True))
    _assert_same(a, b)


def test_bytetrack_batched_mode_identical():
    from tracklab_tpu.trackers.bytetrack import ByteTrackConfig
    from test_bytetrack import run_jax

    frames = synth_stream(4, n_frames=50)
    cfg = ByteTrackConfig(track_thresh=0.5, track_buffer=12,
                          max_tracks=64, max_dets=32)
    _assert_same(run_jax(frames, cfg),
                 run_jax(frames, dataclasses.replace(cfg, batched=True)))


def test_strongsort_batched_mode_identical():
    from tracklab_tpu.trackers.strongsort import StrongSortConfig
    from test_strongsort import run_jax, KW

    frames, embs = synth_stream_with_emb(6, n_frames=40)
    cfg = StrongSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           **KW)
    _assert_same(
        run_jax(frames, embs, cfg),
        run_jax(frames, embs, dataclasses.replace(cfg, batched=True)))


def test_deepocsort_batched_mode_identical():
    from tracklab_tpu.trackers.deepocsort import DeepOCSortConfig
    from test_deepocsort import run_jax, KW

    frames, embs = synth_stream_with_emb(7, n_frames=40)
    cfg = DeepOCSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           asso_func="iou", **KW)
    _assert_same(
        run_jax(frames, embs, cfg),
        run_jax(frames, embs, dataclasses.replace(cfg, batched=True)))


def test_botsort_batched_mode_identical():
    from tracklab_tpu.trackers.botsort import BotSortConfig
    from test_botsort import run_jax, KW

    frames, embs = synth_stream_with_emb(8, n_frames=40)
    cfg = BotSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM, **KW)
    _assert_same(
        run_jax(frames, embs, cfg),
        run_jax(frames, embs, dataclasses.replace(cfg, batched=True)))


def test_vmapped_batched_scan_matches_sequential():
    """The actual multi-video deployment shape: vmap the scan over a
    video axis with batched=True; every video's output must equal its
    single-video (batched=False) run."""
    from tracklab_tpu.trackers.ocsort import OCSortConfig, ocsort_scan
    from tracklab_tpu.trackers.common import Detections, pad_detections

    cfg = OCSortConfig(max_tracks=32, max_dets=16, **CFG_KW)
    bcfg = dataclasses.replace(cfg, batched=True)
    V = 4
    streams = [synth_stream(20 + v, n_frames=30, n_obj=4)
               for v in range(V)]
    stacked = []
    for frames in streams:
        dets = [pad_detections(f[:, :4], f[:, 4], f[:, 5],
                               f[:, 6].astype(int), capacity=16,
                               dtype=np.float64)
                for f in frames]
        stacked.append(Detections(
            *[jnp.stack([getattr(d, n) for d in dets])
              for n in Detections._fields]))
    batch = Detections(*[jnp.stack([getattr(s, n) for s in stacked])
                         for n in Detections._fields])
    _, out = jax.jit(jax.vmap(lambda d: ocsort_scan(bcfg, d)))(batch)
    for v, frames in enumerate(streams):
        single = run_jax_ocsort(frames, cfg)
        got = []
        for f in range(len(frames)):
            valid = np.asarray(out.valid[v, f])
            got.append([
                (np.asarray(out.ltrb[v, f, t]), int(out.track_id[v, f, t]),
                 float(out.cls[v, f, t]), float(out.conf[v, f, t]),
                 int(out.ref[v, f, t]))
                for t in np.nonzero(valid)[0]])
        _assert_same(got, single)
