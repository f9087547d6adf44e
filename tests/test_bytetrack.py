"""Parity: JAX lax.scan ByteTrack vs the numpy/scipy oracle
(spec: plugins/track/byte_track/byte_tracker.py semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracklab_tpu.trackers.bytetrack import (
    ByteTrackConfig, bytetrack_scan,
)
from tracklab_tpu.trackers.common import Detections, pad_detections
from oracles.bytetrack_oracle import ByteTrackOracle
from test_ocsort import synth_stream, assert_frames_equal


def run_jax(frames, cfg: ByteTrackConfig):
    dets = [pad_detections(f[:, :4], f[:, 4], f[:, 5], f[:, 6].astype(int),
                           capacity=cfg.max_dets, dtype=np.float64)
            for f in frames]
    stacked = Detections(*[jnp.stack([getattr(d, n) for d in dets])
                           for n in Detections._fields])
    _, out = jax.jit(lambda d: bytetrack_scan(cfg, d))(stacked)
    res = []
    for f in range(len(frames)):
        valid = np.asarray(out.valid[f])
        res.append([
            (np.asarray(out.ltrb[f, t]), int(out.track_id[f, t]),
             float(out.cls[f, t]), float(out.conf[f, t]),
             int(out.ref[f, t]))
            for t in np.nonzero(valid)[0]])
    return res


KW = dict(track_thresh=0.6, match_thresh=0.8, track_buffer=12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parity_random_stream(seed):
    frames = synth_stream(seed, n_frames=60, n_obj=6, drop=0.15)
    cfg = ByteTrackConfig(max_tracks=64, max_dets=32, **KW)
    orc = ByteTrackOracle(**KW)
    want = [orc.update(f) for f in frames]
    got = run_jax(frames, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_parity_heavy_occlusion():
    frames = synth_stream(11, n_frames=80, n_obj=5, drop=0.35, fp_rate=0.4)
    cfg = ByteTrackConfig(max_tracks=64, max_dets=32, **KW)
    orc = ByteTrackOracle(**KW)
    want = [orc.update(f) for f in frames]
    got = run_jax(frames, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_empty_and_low_conf_only():
    frames = [np.zeros((0, 7))] + [
        np.array([[10, 10, 50, 50, 0.3, 0, 0]], np.float64)] * 3
    cfg = ByteTrackConfig(max_tracks=16, max_dets=8, **KW)
    got = run_jax(frames, cfg)
    assert all(len(g) == 0 for g in got)
