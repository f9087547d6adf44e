"""Parity: JAX lax.scan BoT-SORT vs the numpy/scipy oracle, including
camera-warp compensation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracklab_tpu.trackers.botsort import BotSortConfig, botsort_scan
from tracklab_tpu.trackers.common import Detections, pad_detections
from oracles.botsort_oracle import BotSortOracle
from test_ocsort import assert_frames_equal
from test_strongsort import synth_stream_with_emb, E_DIM


def run_jax(frames, embs, cfg: BotSortConfig, warps=None):
    dets = [pad_detections(f[:, :4], f[:, 4], f[:, 5], f[:, 6].astype(int),
                           capacity=cfg.max_dets, dtype=np.float64)
            for f in frames]
    stacked = Detections(*[jnp.stack([getattr(d, n) for d in dets])
                           for n in Detections._fields])
    F = len(frames)
    emb = np.zeros((F, cfg.max_dets, cfg.embed_dim))
    for f, e in enumerate(embs):
        emb[f, :len(e)] = e
    w = None if warps is None else jnp.asarray(np.stack(warps))
    fn = jax.jit(lambda d, e, w_: botsort_scan(cfg, d, e, w_)) \
        if warps is not None else jax.jit(
            lambda d, e: botsort_scan(cfg, d, e))
    _, out = (fn(stacked, jnp.asarray(emb), w) if warps is not None
              else fn(stacked, jnp.asarray(emb)))
    res = []
    for f in range(F):
        valid = np.asarray(out.valid[f])
        res.append([
            (np.asarray(out.ltrb[f, t]), int(out.track_id[f, t]),
             float(out.cls[f, t]), float(out.conf[f, t]),
             int(out.ref[f, t]))
            for t in np.nonzero(valid)[0]])
    return res


KW = dict(track_high_thresh=0.45, new_track_thresh=0.5, track_buffer=12,
          match_thresh=0.25, proximity_thresh=0.6, appearance_thresh=0.45,
          lambda_=0.985, ema_alpha=0.9)


@pytest.mark.parametrize("seed", [0, 1])
def test_parity_random_stream(seed):
    frames, embs = synth_stream_with_emb(seed, n_frames=50)
    cfg = BotSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM, **KW)
    orc = BotSortOracle(**KW)
    want = [orc.update(f, e) for f, e in zip(frames, embs)]
    got = run_jax(frames, embs, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_parity_with_camera_warps():
    rng = np.random.default_rng(2)
    frames, embs = synth_stream_with_emb(2, n_frames=40, drop=0.2)
    warps = []
    for f in range(len(frames)):
        ang = rng.normal(0, 0.002)
        t = rng.normal(0, 1.5, 2)
        R = np.array([[np.cos(ang), -np.sin(ang)],
                      [np.sin(ang), np.cos(ang)]])
        warps.append(np.concatenate(
            [R, t[:, None]], axis=1).astype(np.float64))
    cfg = BotSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM, **KW)
    orc = BotSortOracle(**KW)
    want = [orc.update(f, e, w)
            for f, e, w in zip(frames, embs, warps)]
    got = run_jax(frames, embs, cfg, warps=warps)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_empty_frames():
    frames = [np.zeros((0, 7))] * 4
    embs = [np.zeros((0, E_DIM))] * 4
    cfg = BotSortConfig(max_tracks=8, max_dets=4, embed_dim=E_DIM, **KW)
    got = run_jax(frames, embs, cfg)
    assert all(len(g) == 0 for g in got)
