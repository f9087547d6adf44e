"""Parity test: the JAX lax.scan OC-SORT must reproduce the numpy/scipy
oracle (tests/oracles/ocsort_oracle.py — an independent implementation of the
reference semantics, plugins/track/oc_sort/ocsort.py) frame-for-frame on
randomized detection streams with dropouts, noise and false positives."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracklab_tpu.trackers.ocsort import (
    OCSortConfig, ocsort_init, ocsort_step, ocsort_scan,
)
from tracklab_tpu.trackers.common import Detections, pad_detections
from oracles.ocsort_oracle import OCSortOracle


def synth_stream(seed, n_frames=60, n_obj=6, drop=0.15, fp_rate=0.5,
                 img=(1920, 1080)):
    """Linear-motion objects with noisy detections, dropouts and FPs.
    Yields per frame an (N, 7) array [ltrb, conf, cls, ref]."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform([100, 100], [img[0] - 300, img[1] - 300], (n_obj, 2))
    vel = rng.uniform(-8, 8, (n_obj, 2))
    size = rng.uniform(40, 160, (n_obj, 2))
    frames = []
    ref_counter = 0
    for f in range(n_frames):
        rows = []
        pos = pos + vel
        for k in range(n_obj):
            if rng.uniform() < drop:
                continue
            c = pos[k] + rng.normal(0, 2, 2)
            s = size[k] * rng.uniform(0.95, 1.05, 2)
            conf = rng.uniform(0.2, 1.0)
            rows.append([c[0], c[1], c[0] + s[0], c[1] + s[1], conf, 1.0,
                         ref_counter])
            ref_counter += 1
        n_fp = rng.poisson(fp_rate)
        for _ in range(n_fp):
            c = rng.uniform([0, 0], [img[0] - 200, img[1] - 200])
            s = rng.uniform(30, 120, 2)
            rows.append([c[0], c[1], c[0] + s[0], c[1] + s[1],
                         rng.uniform(0.15, 0.9), 1.0, ref_counter])
            ref_counter += 1
        frames.append(np.array(rows, np.float64).reshape(-1, 7))
    return frames


def run_oracle(frames, **kw):
    orc = OCSortOracle(**kw)
    return [orc.update(f) for f in frames]


def run_jax(frames, cfg: OCSortConfig):
    dets = [pad_detections(f[:, :4], f[:, 4], f[:, 5], f[:, 6].astype(int),
                           capacity=cfg.max_dets, dtype=np.float64)
            for f in frames]
    stacked = Detections(*[jnp.stack([getattr(d, n) for d in dets])
                           for n in Detections._fields])
    scan = jax.jit(lambda d: ocsort_scan(cfg, d))
    _, out = scan(stacked)
    results = []
    for f in range(len(frames)):
        valid = np.asarray(out.valid[f])
        rows = []
        for t in np.nonzero(valid)[0]:
            rows.append((np.asarray(out.ltrb[f, t]),
                         int(out.track_id[f, t]),
                         float(out.cls[f, t]), float(out.conf[f, t]),
                         int(out.ref[f, t])))
        results.append(rows)
    return results


def assert_frames_equal(got, want, frame_idx):
    got_by_id = {r[1]: r for r in got}
    want_by_id = {r[1]: r for r in want}
    assert set(got_by_id) == set(want_by_id), (
        f"frame {frame_idx}: ids {sorted(got_by_id)} != "
        f"{sorted(want_by_id)}")
    for tid, (box_g, _, cls_g, conf_g, ref_g) in got_by_id.items():
        box_w, _, cls_w, conf_w, ref_w = want_by_id[tid]
        np.testing.assert_allclose(box_g, box_w, rtol=1e-5, atol=1e-5,
                                   err_msg=f"frame {frame_idx} id {tid}")
        assert ref_g == ref_w, f"frame {frame_idx} id {tid} ref"
        np.testing.assert_allclose(conf_g, conf_w, rtol=1e-9)


CFG_KW = dict(det_thresh=0.45, max_age=12, min_hits=2, iou_threshold=0.25,
              delta_t=3, inertia=0.35)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("use_byte", [False, True])
def test_parity_random_stream(seed, use_byte):
    frames = synth_stream(seed)
    cfg = OCSortConfig(use_byte=use_byte, max_tracks=64, max_dets=32,
                       **CFG_KW)
    want = run_oracle(frames, use_byte=use_byte, **CFG_KW)
    got = run_jax(frames, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_parity_heavy_occlusion():
    # high dropout -> exercises ORU replay and OCR recovery
    frames = synth_stream(7, n_frames=80, n_obj=4, drop=0.35, fp_rate=0.2)
    cfg = OCSortConfig(max_tracks=64, max_dets=32, **CFG_KW)
    want = run_oracle(frames, **CFG_KW)
    got = run_jax(frames, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_empty_frames():
    frames = [np.zeros((0, 7))] * 5
    cfg = OCSortConfig(max_tracks=16, max_dets=8, **CFG_KW)
    got = run_jax(frames, cfg)
    assert all(len(g) == 0 for g in got)


def test_capacity_overflow_is_graceful():
    # more detections than track capacity: must not crash, ids stay unique
    rng = np.random.default_rng(3)
    frames = []
    for _ in range(4):
        n = 30
        c = rng.uniform(0, 1500, (n, 2))
        s = rng.uniform(30, 80, (n, 2))
        frames.append(np.concatenate([
            c, c + s, rng.uniform(0.6, 1.0, (n, 1)),
            np.zeros((n, 1)), np.arange(n)[:, None]], axis=1))
    cfg = OCSortConfig(max_tracks=16, max_dets=32, **CFG_KW)
    got = run_jax(frames, cfg)
    for rows in got:
        ids = [r[1] for r in rows]
        assert len(ids) == len(set(ids))
