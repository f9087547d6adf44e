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

import pandas as pd

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


# ---------------------------------------------------------------------------
# Time-concatenated multi-video mode: one sequential scan with state
# resets at video boundaries must be bit-identical to per-video scans
# (the TPU-native single-chip path; vmap alternatives measured 12-40x
# slower on real TPU)
# ---------------------------------------------------------------------------

def _stack_streams(streams, capacity=16):
    from tracklab_tpu.trackers.common import Detections, pad_detections
    out = []
    for frames in streams:
        dets = [pad_detections(f[:, :4], f[:, 4], f[:, 5],
                               f[:, 6].astype(int), capacity=capacity,
                               dtype=np.float64) for f in frames]
        out.append(Detections(
            *[jnp.stack([getattr(d, n) for d in dets])
              for n in Detections._fields]))
    return out


def _concat(trees):
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *trees)


def test_concat_scan_ocsort_identical():
    from tracklab_tpu.trackers.common import concat_resets
    from tracklab_tpu.trackers.ocsort import OCSortConfig, ocsort_scan

    cfg = OCSortConfig(max_tracks=32, max_dets=16, **CFG_KW)
    V, T = 3, 25
    streams = [synth_stream(40 + v, n_frames=T, n_obj=4)
               for v in range(V)]
    vids = _stack_streams(streams)
    flat = _concat(vids)
    resets = concat_resets(V, T)
    _, out = jax.jit(lambda d, r: ocsort_scan(cfg, d, resets=r))(
        flat, resets)
    for v in range(V):
        _, single = jax.jit(lambda d: ocsort_scan(cfg, d))(vids[v])
        seg = jax.tree_util.tree_map(
            lambda x: x[v * T:(v + 1) * T], out)
        for name in single._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(seg, name)),
                np.asarray(getattr(single, name)), err_msg=name)


def test_concat_scan_bytetrack_identical():
    from tracklab_tpu.trackers.common import concat_resets
    from tracklab_tpu.trackers.bytetrack import (
        ByteTrackConfig, bytetrack_scan,
    )

    cfg = ByteTrackConfig(track_thresh=0.5, track_buffer=12,
                          max_tracks=32, max_dets=16)
    V, T = 3, 25
    streams = [synth_stream(50 + v, n_frames=T, n_obj=4)
               for v in range(V)]
    vids = _stack_streams(streams)
    flat = _concat(vids)
    resets = concat_resets(V, T)
    _, out = jax.jit(lambda d, r: bytetrack_scan(cfg, d, resets=r))(
        flat, resets)
    for v in range(V):
        _, single = jax.jit(lambda d: bytetrack_scan(cfg, d))(vids[v])
        seg = jax.tree_util.tree_map(
            lambda x: x[v * T:(v + 1) * T], out)
        for name in single._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(seg, name)),
                np.asarray(getattr(single, name)), err_msg=name)


@pytest.mark.parametrize("tracker", ["strongsort", "botsort",
                                     "deepocsort"])
def test_concat_scan_embedding_trackers_identical(tracker):
    from tracklab_tpu.trackers.common import concat_resets

    V, T = 2, 20
    streams, embs = zip(*[synth_stream_with_emb(60 + v, n_frames=T)
                          for v in range(V)])
    vids = _stack_streams(streams)
    cap = vids[0].ltrb.shape[1]
    embs = [jnp.asarray(np.stack([
        np.pad(e, ((0, cap - len(e)), (0, 0))) if len(e) < cap
        else e[:cap] for e in stream_emb]))
        for stream_emb in embs]
    if tracker == "strongsort":
        from tracklab_tpu.trackers.strongsort import (
            StrongSortConfig, strongsort_scan,
        )
        from test_strongsort import KW
        cfg = StrongSortConfig(max_tracks=32, max_dets=cap,
                               embed_dim=E_DIM, **KW)
        scan = strongsort_scan
    elif tracker == "botsort":
        from tracklab_tpu.trackers.botsort import (
            BotSortConfig, botsort_scan,
        )
        from test_botsort import KW
        cfg = BotSortConfig(max_tracks=32, max_dets=cap,
                            embed_dim=E_DIM, **KW)
        scan = botsort_scan
    else:
        from tracklab_tpu.trackers.deepocsort import (
            DeepOCSortConfig, deepocsort_scan,
        )
        from test_deepocsort import KW
        cfg = DeepOCSortConfig(max_tracks=32, max_dets=cap,
                               embed_dim=E_DIM, asso_func="iou", **KW)
        scan = deepocsort_scan
    flat = _concat(vids)
    emb_flat = jnp.concatenate(embs, axis=0)
    resets = concat_resets(V, T)
    _, out = jax.jit(
        lambda d, e, r: scan(cfg, d, e, resets=r))(flat, emb_flat,
                                                   resets)
    for v in range(V):
        _, single = jax.jit(lambda d, e: scan(cfg, d, e))(vids[v],
                                                          embs[v])
        seg = jax.tree_util.tree_map(
            lambda x: x[v * T:(v + 1) * T], out)
        for name in single._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(seg, name)),
                np.asarray(getattr(single, name)), err_msg=name)


def test_process_video_batch_uses_concat(tmp_path):
    """The wrapper's single-chip batch path (now time-concat) matches
    per-video process()."""
    from tracklab_tpu.wrappers.track import OCSORT

    rng = np.random.default_rng(1)
    items = []
    for v in range(3):
        frames = synth_stream(70 + v, n_frames=15, n_obj=3)
        rows, metas = [], []
        rid = 1000 * v
        for f, arr in enumerate(frames):
            metas.append(dict(frame=f, video_id=v, _id=v * 100 + f))
            for r in arr:
                rows.append(dict(
                    image_id=v * 100 + f,
                    bbox_ltwh=np.array([r[0], r[1], r[2] - r[0],
                                        r[3] - r[1]], np.float32),
                    bbox_conf=float(r[4]), category_id=1, _id=rid))
                rid += 1
        dets = pd.DataFrame(rows).set_index("_id")
        meta = pd.DataFrame(metas).set_index("_id")
        items.append((dets, meta))
    mod = OCSORT(min_hits=1, det_thresh=0.4, max_dets=16, max_tracks=32)
    batch_out = mod.process_video_batch(items)
    for (dets, meta), got in zip(items, batch_out):
        mod2 = OCSORT(min_hits=1, det_thresh=0.4, max_dets=16,
                      max_tracks=32)
        want = mod2.process(dets, meta)
        got_ids = got["track_id"].sort_index()
        want_ids = want["track_id"].sort_index()
        common = got_ids.index.intersection(want_ids.index)
        assert len(common) > 0
        np.testing.assert_array_equal(got_ids.loc[common].to_numpy(),
                                      want_ids.loc[common].to_numpy())


def test_process_video_batch_embedding_tracker():
    """Embedding trackers batch through the same time-concat path and
    match per-video process()."""
    from tracklab_tpu.wrappers.track import StrongSORT

    rng = np.random.default_rng(2)
    items = []
    for v in range(2):
        frames, embs = synth_stream_with_emb(80 + v, n_frames=12)
        rows, metas = [], []
        rid = 1000 * v
        for f, (arr, es) in enumerate(zip(frames, embs)):
            metas.append(dict(frame=f, video_id=v, _id=v * 100 + f))
            for r, e in zip(arr, es):
                rows.append(dict(
                    image_id=v * 100 + f,
                    bbox_ltwh=np.array([r[0], r[1], r[2] - r[0],
                                        r[3] - r[1]], np.float32),
                    bbox_conf=float(r[4]), category_id=1,
                    embeddings=np.asarray(e, np.float32), _id=rid))
                rid += 1
        dets = pd.DataFrame(rows).set_index("_id")
        meta = pd.DataFrame(metas).set_index("_id")
        items.append((dets, meta))
    kw = dict(embed_dim=E_DIM, max_dets=16, max_tracks=32, n_init=1,
              min_confidence=0.0)
    mod = StrongSORT(**kw)
    batch_out = mod.process_video_batch(items)
    for (dets, meta), got in zip(items, batch_out):
        want = StrongSORT(**kw).process(dets, meta)
        common = got.index.intersection(want.index)
        assert len(common) > 0
        np.testing.assert_array_equal(
            got.loc[common, "track_id"].to_numpy(),
            want.loc[common, "track_id"].to_numpy())
