"""Parity: JAX lax.scan StrongSORT vs the numpy/scipy oracle (spec:
plugins/track/strong_sort semantics — NSA KF, gallery appearance stage,
mc_lambda gating blend, IoU second stage, EMA features)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracklab_tpu.trackers.strongsort import (
    StrongSortConfig, strongsort_scan,
)
from tracklab_tpu.trackers.common import Detections, pad_detections
from oracles.strongsort_oracle import StrongSortOracle
from test_ocsort import assert_frames_equal

E_DIM = 32


def synth_stream_with_emb(seed, n_frames=50, n_obj=5, drop=0.15,
                          fp_rate=0.3, img=(1920, 1080)):
    rng = np.random.default_rng(seed)
    pos = rng.uniform([100, 100], [img[0] - 300, img[1] - 300], (n_obj, 2))
    vel = rng.uniform(-7, 7, (n_obj, 2))
    size = rng.uniform(50, 150, (n_obj, 2))
    obj_emb = rng.normal(size=(n_obj, E_DIM))
    frames, embs = [], []
    ref = 0
    for f in range(n_frames):
        rows, es = [], []
        pos = pos + vel
        for k in range(n_obj):
            if rng.uniform() < drop:
                continue
            c = pos[k] + rng.normal(0, 2, 2)
            s = size[k]
            rows.append([c[0], c[1], c[0] + s[0], c[1] + s[1],
                         rng.uniform(0.5, 1.0), 1.0, ref])
            es.append(obj_emb[k] + rng.normal(0, 0.1, E_DIM))
            ref += 1
        for _ in range(rng.poisson(fp_rate)):
            c = rng.uniform([0, 0], [img[0] - 200, img[1] - 200])
            s = rng.uniform(40, 120, 2)
            rows.append([c[0], c[1], c[0] + s[0], c[1] + s[1],
                         rng.uniform(0.4, 0.9), 1.0, ref])
            es.append(rng.normal(size=E_DIM))
            ref += 1
        frames.append(np.array(rows, np.float64).reshape(-1, 7))
        embs.append(np.array(es, np.float64).reshape(-1, E_DIM))
    return frames, embs


def run_jax(frames, embs, cfg: StrongSortConfig):
    dets = [pad_detections(f[:, :4], f[:, 4], f[:, 5], f[:, 6].astype(int),
                           capacity=cfg.max_dets, dtype=np.float64)
            for f in frames]
    stacked = Detections(*[jnp.stack([getattr(d, n) for d in dets])
                           for n in Detections._fields])
    F = len(frames)
    emb = np.zeros((F, cfg.max_dets, cfg.embed_dim))
    for f, e in enumerate(embs):
        emb[f, :len(e)] = e
    fn = jax.jit(lambda d, e: strongsort_scan(cfg, d, e))
    _, out = fn(stacked, jnp.asarray(emb))
    res = []
    for f in range(F):
        valid = np.asarray(out.valid[f])
        res.append([
            (np.asarray(out.ltrb[f, t]), int(out.track_id[f, t]),
             float(out.cls[f, t]), float(out.conf[f, t]),
             int(out.ref[f, t]))
            for t in np.nonzero(valid)[0]])
    return res


KW = dict(max_dist=0.25, max_iou_dist=0.55, max_age=15, n_init=3,
          nn_budget=20, mc_lambda=0.995, ema_alpha=0.9)


@pytest.mark.parametrize("seed", [0, 1])
def test_parity_random_stream(seed):
    frames, embs = synth_stream_with_emb(seed)
    cfg = StrongSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           **KW)
    orc = StrongSortOracle(**KW)
    want = [orc.update(f, e) for f, e in zip(frames, embs)]
    got = run_jax(frames, embs, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_parity_heavy_occlusion():
    frames, embs = synth_stream_with_emb(5, n_frames=70, n_obj=4,
                                         drop=0.3, fp_rate=0.2)
    cfg = StrongSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           **KW)
    orc = StrongSortOracle(**KW)
    want = [orc.update(f, e) for f, e in zip(frames, embs)]
    got = run_jax(frames, embs, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_empty_frames():
    frames = [np.zeros((0, 7))] * 4
    embs = [np.zeros((0, E_DIM))] * 4
    cfg = StrongSortConfig(max_tracks=8, max_dets=4, embed_dim=E_DIM, **KW)
    got = run_jax(frames, embs, cfg)
    assert all(len(g) == 0 for g in got)
