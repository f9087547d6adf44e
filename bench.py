"""Benchmark harness — run on real TPU by the driver.

Measures end-to-end tracked FPS per chip for the on-device tracking path
(padded detections -> lax.scan OC-SORT -> outputs), the BASELINE.md
primary metric shape ("end-to-end tracked FPS per chip", target >= 300 on
v5e). Until the detector is wired into the bench, this covers the
association/KF/assignment pipeline that the reference runs on host per
frame (SURVEY §3.2: the #1 hot loop the TPU rebuild eliminates).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_FPS = 300.0  # BASELINE.json north-star: >=300 FPS/chip on v5e


def make_stream(n_frames: int, n_obj: int, d_cap: int, seed: int = 0):
    import jax.numpy as jnp
    from tracklab_tpu.trackers.common import Detections

    rng = np.random.default_rng(seed)
    ltrb = np.zeros((n_frames, d_cap, 4), np.float32)
    conf = np.zeros((n_frames, d_cap), np.float32)
    valid = np.zeros((n_frames, d_cap), bool)
    pos = rng.uniform([100, 100], [1600, 800], (n_obj, 2))
    vel = rng.uniform(-6, 6, (n_obj, 2))
    size = rng.uniform(40, 150, (n_obj, 2))
    for f in range(n_frames):
        pos = pos + vel
        flip = (pos < 0) | (pos > [1700, 900])
        vel = np.where(flip, -vel, vel)
        pos = np.clip(pos, 0, [1700, 900])
        n = 0
        for k in range(n_obj):
            if rng.uniform() < 0.1:     # dropout like real detectors
                continue
            c = pos[k] + rng.normal(0, 2, 2)
            ltrb[f, n] = [c[0], c[1], c[0] + size[k, 0], c[1] + size[k, 1]]
            conf[f, n] = rng.uniform(0.5, 1.0)
            valid[f, n] = True
            n += 1
    ref = np.broadcast_to(np.arange(d_cap, dtype=np.int32),
                          (n_frames, d_cap)).copy()
    return Detections(jnp.asarray(ltrb), jnp.asarray(conf),
                      jnp.asarray(np.zeros((n_frames, d_cap), np.float32)),
                      jnp.asarray(ref), jnp.asarray(valid))


def main():
    import jax
    from tracklab_tpu.trackers.ocsort import OCSortConfig, ocsort_scan

    n_frames = 512
    n_obj = 20
    cfg = OCSortConfig(max_tracks=64, max_dets=32, min_hits=1)
    dets = make_stream(n_frames, n_obj, cfg.max_dets)

    scan = jax.jit(lambda d: ocsort_scan(cfg, d))
    # compile + warmup
    _, out = scan(dets)
    jax.block_until_ready(out.valid)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        _, out = scan(dets)
        jax.block_until_ready(out.valid)
    dt = (time.perf_counter() - t0) / reps
    fps = n_frames / dt

    print(json.dumps({
        "metric": "ocsort_scan_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
