"""Benchmark harness — run on real TPU by the driver.

End-to-end tracked FPS per chip, MEASURED on the fused device program
(engine/fused.py): uint8 frames -> YOLOX-s bf16 -> NMS -> padded
Detections -> OC-SORT scan, one lax.scan over frame chunks carrying
tracker state — a single XLA dispatch per video. This is the BASELINE.md
primary metric ("end-to-end tracked FPS per chip", target >= 300 on
v5e). Stage micro-rates and the other fused pipeline shapes go to
stderr as JSON lines.

Timeout robustness (VERDICT r3 item 1):
  * The persistent compile cache lives in the REPO (cache/jax_cache) —
    it survives the /tmp wipes that cost round 3 its number.
  * The stdout headline JSON is printed with flush=True IMMEDIATELY
    after the coherent fused measurement; every other section runs
    after it.
  * A watchdog thread enforces a wall-clock budget
    (TRACKLAB_TPU_BENCH_BUDGET_S, default 1260 s): at the deadline it
    prints the best available number (the stage-derived fallback if the
    fused program hasn't finished compiling) and exits 0, so the driver
    always parses a line.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "mode": ...}
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(_REPO, "cache", "jax_cache")
os.makedirs(CACHE_DIR, exist_ok=True)

import numpy as np

TARGET_FPS = 300.0  # BASELINE.json north-star: >=300 FPS/chip on v5e
BUDGET_S = float(os.environ.get("TRACKLAB_TPU_BENCH_BUDGET_S", "1260"))
_T0 = time.monotonic()

_PRINT_LOCK = threading.Lock()
_STATE: dict = {"printed": False, "fallback": None}


def elapsed() -> float:
    return time.monotonic() - _T0


def remaining() -> float:
    return BUDGET_S - elapsed()


def note(**kv) -> None:
    """Progress/extra metrics: one JSON line on stderr, flushed."""
    kv.setdefault("t", round(elapsed(), 1))
    print(json.dumps(kv), file=sys.stderr, flush=True)


def emit_headline(payload: dict) -> bool:
    """Print THE stdout JSON line (at most once per process)."""
    with _PRINT_LOCK:
        if _STATE["printed"]:
            return False
        _STATE["printed"] = True
    print(json.dumps(payload), flush=True)
    return True


def set_fallback(fps: float, mode: str) -> None:
    _STATE["fallback"] = {
        "metric": "e2e_detect_track_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "mode": mode,
    }


def _watchdog() -> None:
    while remaining() > 0:
        time.sleep(min(5.0, max(0.1, remaining())))
    payload = _STATE["fallback"] or {
        "metric": "e2e_detect_track_fps_per_chip",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "mode": "timeout_no_number",
    }
    fresh = emit_headline(payload)
    note(watchdog="budget_expired", budget_s=BUDGET_S,
         printed_fallback=fresh)
    # hard-exit: a remote XLA compile cannot be interrupted from Python,
    # and an rc!=0 / driver-side kill may discard stdout entirely.
    os._exit(0)


def tracker_stream(n_frames, n_obj, d_cap, seed=0):
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
            if rng.uniform() < 0.1:
                continue
            c = pos[k] + rng.normal(0, 2, 2)
            ltrb[f, n] = [c[0], c[1], c[0] + size[k, 0], c[1] + size[k, 1]]
            conf[f, n] = rng.uniform(0.5, 1.0)
            valid[f, n] = True
            n += 1
    ref = np.broadcast_to(np.arange(d_cap, dtype=np.int32),
                          (n_frames, d_cap)).copy()
    return Detections(jnp.asarray(ltrb), jnp.asarray(conf),
                      jnp.zeros((n_frames, d_cap), jnp.float32),
                      jnp.asarray(ref), jnp.asarray(valid))


def main():
    from functools import partial

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from tracklab_tpu.engine.fused import (fused_detect_track,
                                           make_yolox_detect_fn)
    from tracklab_tpu.models.yolox import YOLOX
    from tracklab_tpu.ops.nms import postprocess_detections
    from tracklab_tpu.trackers.ocsort import (OCSortConfig, ocsort_init,
                                              ocsort_scan, ocsort_step)

    reps = 5
    note(phase="start", budget_s=BUDGET_S,
         devices=[str(d) for d in jax.devices()])

    # ---- dispatch-floor regime stamp (VERDICT r4 weak item 3): the
    # axon tunnel's per-dispatch cost drifts (observed 25 ms .. 7x
    # degraded); every measurement below carries the floor measured
    # NEXT TO IT so cross-round comparisons can tell a slow chip from a
    # slow tunnel. On real TPU hosts the floor is ~0.1-0.5 ms.
    _floor_fn = jax.jit(lambda x: x + 1)
    _floor_x = jax.device_put(np.zeros((8,), np.float32))
    np.asarray(_floor_fn(_floor_x)).sum()  # compile

    def floor_ms(n: int = 3) -> float:
        ts = []
        for _ in range(n):
            t = time.perf_counter()
            np.asarray(_floor_fn(_floor_x)).sum()
            ts.append(time.perf_counter() - t)
        return round(sorted(ts)[len(ts) // 2] * 1000, 1)

    # CRITICAL-PATH DISCIPLINE (r4: a degraded tunnel run showed the
    # old ordering spending 1092 s on the tracker-scan phase before the
    # headline): the ONLY work ahead of the stdout headline is
    # (a) staging the headline video — in a BACKGROUND thread so the
    #     ~1.8 GB tunnel transfer overlaps the detector compile,
    # (b) the detector compile, whose warmup call doubles as the NMS
    #     calibration read and whose single timed rep arms an honest
    #     early fallback, and
    # (c) the fused-program compile + measurement itself.
    # Stage micro-rates (tracker scan, detector reps) run AFTER.
    BATCH = 384  # r2 sweep: bs=256 2165, bs=320 2182, bs=384 2371 img/s
    # (HBM-bound; r3 fused stem lifted it further). NMS postprocess is a
    # net WIN: it shrinks the program output from the 51 MB decoded
    # tensor to fixed (B, 32) detections.
    H = W = 640
    n_chunks = 4
    F = n_chunks * BATCH  # 1536 frames ~ one MOT17 video, 1.8 GB uint8

    # Stage the video as uint8 ON THE HOST before device_put: the naive
    # jnp.asarray(base + noise, uint8) built a 14.7 GB int64 intermediate
    # and risked shipping int64 through the ~17 MB/s tunnel (~790 s of
    # dead time before the r4b headline). uint8 end-to-end: 255 max
    # (234 + 19) so the sum cannot wrap.
    _staged: dict = {}

    def _stage_video():
        rng1 = np.random.default_rng(1)
        base = rng1.integers(0, 235, (1, H, W, 3), dtype=np.uint8)
        noise = rng1.integers(0, 20, (F, H, W, 3), dtype=np.uint8)
        _staged["video"] = jax.device_put(base + noise)
        np.asarray(_staged["video"][0, 0, 0]).sum()  # force completion

    stager = threading.Thread(target=_stage_video, daemon=True)
    stager.start()

    # ---- detector compile (overlapped with the staging thread) ----
    cfg = OCSortConfig(max_tracks=64, max_dets=32, min_hits=1)
    model = YOLOX(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), train=False)

    def detect(imgs):
        imgs = imgs.astype(jnp.bfloat16)
        decoded = model.apply(variables, imgs, method=YOLOX.predict)
        return postprocess_detections(decoded, conf_threshold=0.3,
                                      max_out=32)

    det_fn = jax.jit(detect)
    # warm the compile on device-materialized zeros (no host transfer,
    # same shape/dtype as the video slices -> one compile total)
    np.asarray(det_fn(jnp.zeros((BATCH, H, W, 3), jnp.uint8))
               ["valid"]).sum()
    note(phase="detector_compiled")
    stager.join()
    video = _staged["video"]
    note(phase="video_staged", gb=round(video.nbytes / 2**30, 2))

    # one timed detector rep: arms the watchdog with a MEASURED number
    # before the fused compile starts. Clearly labeled as the detector
    # stage alone (the fused e2e has historically been ~0.9x of it).
    t0 = time.perf_counter()
    cal_out = det_fn(video[:BATCH])
    np.asarray(cal_out["valid"]).sum()
    det_quick = BATCH / (time.perf_counter() - t0)
    set_fallback(det_quick, "fallback_detector_stage_only")
    note(phase="detector_quick", fps=round(det_quick, 1), batch=BATCH,
         floor_ms=floor_ms())

    # ---- THE e2e metric: the fused single-program pipeline ----
    # frames -> detector -> NMS -> tracker state carried across chunks,
    # one dispatch for the whole video.
    #
    # Workload realism: the video is quasi-static (base frame + small
    # temporal noise), so the random-weight detector's NMS output is
    # frame-COHERENT — detections persist and match across frames like
    # real MOT objects. An i.i.d.-random video instead yields 32
    # unmatchable new boxes every frame — the adversarial worst case,
    # reported separately AFTER the headline. The NMS threshold is
    # auto-calibrated so ~20 detections/frame survive: the same
    # 20-object load as the tracker micro-bench.
    # calibrate: threshold between the 20th and 21st best NMS'd score on
    # frame 0, read from the ALREADY-COMPILED bs=384 det_fn (the timed
    # rep above — zero new compiles). The r3 bench compiled a
    # bs=1 raw-predict probe for this, which cost a 31-minute cold
    # remote compile — the single largest item on the critical path.
    # det_fn thresholds at 0.3 pre-NMS and keeps the top-32 survivors;
    # setting conf between NMS'd scores 20/21 makes exactly ~20 coherent
    # detections survive in the fused program (same iou_threshold=0.65).
    # Deterministic seeds + weights -> stable value across runs, so the
    # fused program hash stays cacheable.
    cal_valid = np.asarray(cal_out["valid"][0])
    cal_s = np.sort(np.asarray(cal_out["score"][0])[cal_valid])[::-1]
    if cal_s.size >= 21:
        conf_cal = float(round((cal_s[19] + cal_s[20]) / 2, 6))
    else:
        # fewer than 21 NMS survivors above det_fn's 0.3 floor: pass
        # them all through (the workload note reports the live count)
        conf_cal = 0.3
    note(phase="calibrated", conf=conf_cal, frame0_dets=int(cal_valid.sum()))

    def timed_reps(once, cap_s=60.0):
        """Up to `reps` timed calls, stopping early once `cap_s` of
        wall clock is spent (>=1 rep always): a degraded tunnel turns
        5 reps of a 3 s dispatch into 5 minutes — when dispatch is that
        slow the extra reps add no fidelity, only budget burn."""
        t0 = time.perf_counter()
        n = 0
        for _ in range(reps):
            once()
            n += 1
            if time.perf_counter() - t0 > cap_s:
                break
        return (time.perf_counter() - t0) / n, n

    def run_fused(video, conf, tag):
        detect_fn = make_yolox_detect_fn(
            model, variables, conf_threshold=conf, iou_threshold=0.65,
            max_dets=cfg.max_dets, compute_dtype=jnp.bfloat16)
        fused = jax.jit(lambda f: fused_detect_track(
            detect_fn, partial(ocsort_step, cfg), ocsort_init(cfg), f,
            chunk=BATCH, return_detections=False))
        _, _, out = fused(video)
        per_frame = float(np.asarray(out.valid).sum(1).mean())

        def once():
            _, _, out = fused(video)
            np.asarray(out.valid).sum()

        dt, n = timed_reps(once)
        note(fused_variant=tag, fps=round(F / dt, 1),
             tracks_per_frame=round(per_frame, 1), reps=n,
             floor_ms=floor_ms())
        return F / dt

    e2e_fps = run_fused(video, conf_cal, "coherent_20obj")

    # ======== THE stdout line — printed before anything else runs ======
    emit_headline({
        "metric": "e2e_detect_track_fps_per_chip",
        "value": round(e2e_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(e2e_fps / TARGET_FPS, 3),
        "mode": "fused_measured",
        "floor_ms": floor_ms(),
    })
    # ---- stage micro-rates (post-headline: they feed notes and the
    # int8 extra, not the stdout line). Detector reps on i.i.d. random
    # frames (the r1-r3 methodology, comparable across rounds).
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (BATCH, H, W, 3), dtype=np.uint8))
    np.asarray(det_fn(images)["valid"]).sum()
    det_dt, _n = timed_reps(
        lambda: np.asarray(det_fn(images)["valid"]).sum())
    det_fps = BATCH / det_dt
    note(phase="detector", fps=round(det_fps, 1), batch=BATCH, reps=_n,
         floor_ms=floor_ms())

    # tracker stage (micro): OC-SORT scan over a full video.
    n_frames = 512
    dets = tracker_stream(n_frames, 20, cfg.max_dets)
    scan = jax.jit(lambda d: ocsort_scan(cfg, d))
    # NOTE: timings force a host transfer per rep (np.asarray) because
    # block_until_ready is unreliable through remote-device tunnels.
    _, o = scan(dets)
    np.asarray(o.valid).sum()

    def _scan_once():
        _, o = scan(dets)
        np.asarray(o.valid).sum()

    scan_dt, _n = timed_reps(_scan_once)
    trk_fps = n_frames / scan_dt
    note(phase="tracker_scan", fps=round(trk_fps, 1), reps=_n,
         floor_ms=floor_ms())

    note(detector_fps=round(det_fps, 1),
         tracker_scan_fps=round(trk_fps, 1),
         e2e_mode="fused_single_program", e2e_frames=F, e2e_chunk=BATCH)

    # ---- everything below is extra: stderr JSON lines, budget-guarded,
    # failure-isolated. The watchdog exits 0 at the deadline regardless.
    # KPR ViT lowering A/B knobs (attn/pad are output-identical; gelu
    # "erfpoly" deviates from exact erf by <=1 bf16 ulp on ~6% of
    # activations — below the bf16 compute noise these shapes already
    # run in, and worth ~1.6x on the ViT stack; BASELINE.md):
    _KPR_ATTN = os.environ.get("TRACKLAB_TPU_KPR_ATTN", "naive")
    _KPR_PAD = int(os.environ.get("TRACKLAB_TPU_KPR_PAD", "0"))
    _KPR_GELU = os.environ.get("TRACKLAB_TPU_KPR_GELU", "erfpoly")

    def extra(tag, min_budget_s, fn):
        if os.environ.get("TRACKLAB_TPU_BENCH_SKIP_EXTRAS"):
            return
        if remaining() < min_budget_s:
            note(skipped=tag, reason="budget",
                 remaining_s=round(remaining(), 1))
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — isolate extras
            note(failed=tag, error=f"{type(e).__name__}: {e}"[:300])

    def bench_calls(fn, arg, n_out_frames, tag, **kv):
        def force(out):
            v = out.valid if hasattr(out, "valid") else out
            np.asarray(v).sum()

        force(fn(arg))
        dt, n = timed_reps(lambda: force(fn(arg)))
        note(fused_variant=tag, fps=round(n_out_frames / dt, 1),
             reps=n, floor_ms=floor_ms(), **kv)
        return n_out_frames / dt

    # adversarial saturation: i.i.d. frames -> 32 incoherent dets/frame,
    # max births + full-capacity association every frame (same program
    # as the headline: no new compile)
    def saturated():
        video_iid = jnp.asarray(np.random.default_rng(2).integers(
            0, 255, (F, H, W, 3), dtype=np.uint8))
        run_fused(video_iid, 0.3, "saturated_worst_case")

    extra("saturated_worst_case", 60, saturated)

    # ---- fused detect->ReID->track (BASELINE config 2: YOLOX + OSNet +
    # StrongSORT as ONE device program). Default-on since r4.
    def reid():
        from tracklab_tpu.engine.fused import (fused_detect_reid_track,
                                               make_osnet_embed_fn)
        from tracklab_tpu.models.osnet import OSNet
        from tracklab_tpu.trackers.strongsort import (
            StrongSortConfig, strongsort_init, strongsort_step)

        R_CHUNK = int(os.environ.get("TRACKLAB_TPU_REID_CHUNK", "64"))
        R_DETS = 32
        osnet = OSNet(variant="x1_0", feat_dim=512, n_parts=6,
                      dtype=jnp.bfloat16)
        ovars = osnet.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 256, 128, 3)), train=False)
        embed = make_osnet_embed_fn(osnet, ovars, crop_size=(256, 128),
                                    compute_dtype=jnp.bfloat16)
        detect_r = make_yolox_detect_fn(
            model, variables, conf_threshold=conf_cal,
            iou_threshold=0.65, max_dets=R_DETS,
            compute_dtype=jnp.bfloat16)
        scfg = StrongSortConfig(max_tracks=64, max_dets=R_DETS, n_init=1)
        F_R = 8 * R_CHUNK
        # live-prefix compaction: the ~20-live coherent workload embeds
        # 24 slots instead of 32 (exactness: test_fused_pipeline.py
        # test_fused_reid_embed_buckets_exact); crops ride the one-hot
        # MXU sampler on TPU (models/preprocess.crop_resize_auto)
        fused_r = jax.jit(lambda f: fused_detect_reid_track(
            detect_r, embed, partial(strongsort_step, scfg),
            strongsort_init(scfg), f, chunk=R_CHUNK,
            min_confidence=0.4, embed_dim=512,
            embed_buckets=(8, 16, 24, 32),
            return_detections=False))
        bench_calls(lambda v: fused_r(v)[3], video[:F_R], F_R,
                    "detect_reid_track", chunk=R_CHUNK)

    extra("detect_reid_track", 240, reid)

    # ---- fused detect->pose->track (the PoseTrack pipeline shape) ----
    def pose():
        from tracklab_tpu.engine.fused import (fused_detect_pose_track,
                                               make_topdown_pose_fn)
        from tracklab_tpu.models.pose import TopDownPose

        # r5 sweep: 32: 503.7, 64: 647.8, 128: 697.8 fps -> 128 default
        P_CHUNK = int(os.environ.get("TRACKLAB_TPU_POSE_CHUNK", "128"))
        P_DETS = 32
        pmodel = TopDownPose(num_keypoints=17, variant="s",
                             dtype=jnp.bfloat16)
        pvars = pmodel.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 256, 192, 3)), train=False)
        pose_fn = make_topdown_pose_fn(pmodel, pvars,
                                       crop_size=(256, 192),
                                       compute_dtype=jnp.bfloat16)
        detect_p = make_yolox_detect_fn(
            model, variables, conf_threshold=conf_cal,
            iou_threshold=0.65, max_dets=P_DETS,
            compute_dtype=jnp.bfloat16)
        pcfg = OCSortConfig(max_tracks=64, max_dets=P_DETS, min_hits=1)
        F_P = 8 * P_CHUNK
        fused_p = jax.jit(lambda f: fused_detect_pose_track(
            detect_p, pose_fn, partial(ocsort_step, pcfg),
            ocsort_init(pcfg), f, chunk=P_CHUNK, min_confidence=0.4,
            pose_buckets=(8, 16, 24, 32),
            return_detections=False))
        bench_calls(lambda v: fused_p(v)[3], video[:F_P], F_P,
                    "detect_pose_track", chunk=P_CHUNK)

    extra("detect_pose_track", 240, pose)

    # ---- fused bottom-up pose -> track (the RTMO pipeline shape:
    # boxes generated from keypoints on device) ----
    def bottomup():
        from tracklab_tpu.engine.fused import (fused_bottomup_track,
                                               make_bottomup_detect_fn)
        from tracklab_tpu.models.pose import YOLOXPose

        # r5 sweep: 64: 885.0, 128: 963.6, 192: 911.5 fps -> 128 default
        B_CHUNK = int(os.environ.get("TRACKLAB_TPU_BU_CHUNK", "128"))
        bmodel = YOLOXPose(num_classes=1, num_keypoints=17, variant="s",
                           dtype=jnp.bfloat16)
        bvars = bmodel.init(jax.random.PRNGKey(5),
                            jnp.zeros((1, H, W, 3)), train=False)
        bdetect = make_bottomup_detect_fn(
            lambda imgs: bmodel.predict(bvars, imgs),
            conf_threshold=0.1, iou_threshold=0.65, max_dets=32,
            compute_dtype=jnp.bfloat16)
        bcfg = OCSortConfig(max_tracks=64, max_dets=32, min_hits=1)
        F_B = 8 * B_CHUNK
        fused_b = jax.jit(lambda f: fused_bottomup_track(
            bdetect, partial(ocsort_step, bcfg), ocsort_init(bcfg), f,
            chunk=B_CHUNK, return_detections=False))
        bench_calls(lambda v: fused_b(v)[3], video[:F_B], F_B,
                    "bottomup_pose_track", chunk=B_CHUNK)

    extra("bottomup_pose_track", 240, bottomup)

    # ---- the FULL GSR prefix fused — detect -> top-down pose ->
    # keypoint-PROMPTED KPR (ViT-B 384x128, cck6 prompts rasterized on
    # device) -> OKS BPBReID-StrongSORT, ONE program. The reference's
    # flagship game-state pipeline runs these as four torch modules
    # through pandas.
    def gsr():
        from tracklab_tpu.engine.fused import (fused_detect_parts_track,
                                               make_kpr_embed_fn,
                                               make_topdown_pose_fn)
        from tracklab_tpu.models.kpr import KPR
        from tracklab_tpu.models.pose import TopDownPose
        from tracklab_tpu.trackers.bpbreid_strongsort import (
            BPBReIDStrongSortConfig, bpbreid_init, bpbreid_step)

        G_CHUNK = int(os.environ.get("TRACKLAB_TPU_GSR_CHUNK", "16"))
        G_DETS = 32
        kpr = KPR(dtype=jnp.bfloat16,       # ViT-B/16 384x128, 5 parts
                  attn_impl=_KPR_ATTN, token_pad=_KPR_PAD, gelu=_KPR_GELU)
        kvars = kpr.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 384, 128, 3)),
                         jnp.zeros((1, 384, 128, 7)), train=False)
        pmodel_g = TopDownPose(num_keypoints=17, variant="s",
                               dtype=jnp.bfloat16)
        pvars_g = pmodel_g.init(jax.random.PRNGKey(4),
                                jnp.zeros((1, 256, 192, 3)),
                                train=False)
        gcfg = BPBReIDStrongSortConfig(
            motion_criterium="oks", n_parts=6, embed_dim=512,
            n_init=1, max_tracks=64, max_dets=G_DETS)
        F_G = 8 * G_CHUNK

        # KPR's ViT-B weights (~86M params) MUST enter the jit as
        # ARGUMENTS: closed-over arrays become HLO literal constants,
        # and the ~170 MB serialized program exceeds remote-compile
        # request limits (observed HTTP 413 through the axon tunnel).
        def build_gsr(f, kv, pv, dv):
            return fused_detect_parts_track(
                make_yolox_detect_fn(model, dv, conf_threshold=conf_cal,
                                     iou_threshold=0.65, max_dets=G_DETS,
                                     compute_dtype=jnp.bfloat16),
                make_kpr_embed_fn(kpr, kv, crop_size=(384, 128),
                                  n_prompt_ch=kpr.n_prompt_ch,
                                  compute_dtype=jnp.bfloat16),
                partial(bpbreid_step, gcfg), bpbreid_init(gcfg), f,
                chunk=G_CHUNK, min_confidence=0.4, n_parts=6,
                embed_dim=512, n_keypoints=17,
                pose_fn=make_topdown_pose_fn(
                    pmodel_g, pv, crop_size=(256, 192),
                    compute_dtype=jnp.bfloat16),
                # live-prefix compaction of the pose+ViT stage: ~20
                # coherent detections -> the 24-wide branch runs 0.75x
                # the crop batch (output-identical, tested in
                # test_fused_pipeline/test_fused_mesh)
                embed_buckets=(24, G_DETS),
                return_detections=False)

        fused_g = jax.jit(build_gsr)
        bench_calls(lambda v: fused_g(v, kvars, pvars_g, variables)[4],
                    video[:F_G], F_G,
                    "detect_pose_kpr_bpbreid", chunk=G_CHUNK)

    extra("detect_pose_kpr_bpbreid", 300, gsr)

    # ---- promptless parts: detect -> KPR part features -> BPBReID
    # (the 3-module shape: no pose, zero prompts — BASELINE row 4) ----
    def parts():
        from tracklab_tpu.engine.fused import (fused_detect_parts_track,
                                               make_kpr_embed_fn)
        from tracklab_tpu.models.kpr import KPR
        from tracklab_tpu.trackers.bpbreid_strongsort import (
            BPBReIDStrongSortConfig, bpbreid_init, bpbreid_step)

        P_CHUNK = int(os.environ.get("TRACKLAB_TPU_GSR_CHUNK", "16"))
        kpr = KPR(dtype=jnp.bfloat16,
                  attn_impl=_KPR_ATTN, token_pad=_KPR_PAD, gelu=_KPR_GELU)
        kvars = kpr.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 384, 128, 3)),
                         jnp.zeros((1, 384, 128, 7)), train=False)
        pcfg = BPBReIDStrongSortConfig(
            motion_criterium="iou", n_parts=6, embed_dim=512,
            n_init=1, max_tracks=64, max_dets=32)
        F_P = 8 * P_CHUNK

        # weights as jit arguments, not closures — see the GSR note
        def build_parts(f, kv, dv):
            return fused_detect_parts_track(
                make_yolox_detect_fn(model, dv, conf_threshold=conf_cal,
                                     iou_threshold=0.65, max_dets=32,
                                     compute_dtype=jnp.bfloat16),
                make_kpr_embed_fn(kpr, kv, crop_size=(384, 128),
                                  n_prompt_ch=kpr.n_prompt_ch,
                                  compute_dtype=jnp.bfloat16),
                partial(bpbreid_step, pcfg), bpbreid_init(pcfg), f,
                chunk=P_CHUNK, min_confidence=0.4, n_parts=6,
                embed_dim=512, n_keypoints=17,
                embed_buckets=(24, 32),  # see the GSR note
                return_detections=False)

        fused_p = jax.jit(build_parts)
        bench_calls(lambda v: fused_p(v, kvars, variables)[4],
                    video[:F_P], F_P,
                    "detect_parts_track", chunk=P_CHUNK)

    extra("detect_parts_track", 300, parts)

    # ---- TIME-CONCAT fused e2e: V short videos as ONE dispatch with
    # tracker-state resets at boundaries (engine/fused.
    # fused_detect_track_concat) vs V per-video dispatches — the
    # many-short-video workload shape (MOT17: ~500-1500 frames/video).
    # The tracker-only path measured time-concat at 2x aggregate fps
    # (BASELINE.md); this measures it for the FULL fused program.
    def concat():
        from tracklab_tpu.engine.fused import fused_detect_track_concat

        V = 8
        F_V = F // V  # 192 frames per video
        detect_c = make_yolox_detect_fn(
            model, variables, conf_threshold=conf_cal,
            iou_threshold=0.65, max_dets=cfg.max_dets,
            compute_dtype=jnp.bfloat16)
        videos = video.reshape(V, F_V, H, W, 3)
        fused_c = jax.jit(lambda v: fused_detect_track_concat(
            detect_c, partial(ocsort_step, cfg), ocsort_init(cfg), v,
            chunk=BATCH, return_detections=False))
        bench_calls(lambda v: fused_c(v)[2], videos, F,
                    "concat_8videos_one_dispatch", videos=V,
                    frames_per_video=F_V)
        # per-video baseline: same total frames, V dispatches (chunk =
        # the whole short video; one compile, V calls per rep)
        fused_1 = jax.jit(lambda f: fused_detect_track(
            detect_c, partial(ocsort_step, cfg), ocsort_init(cfg), f,
            chunk=F_V, return_detections=False))
        np.asarray(fused_1(videos[0])[2].valid).sum()

        def per_video_once():
            for v in range(V):
                np.asarray(fused_1(videos[v])[2].valid).sum()

        dt, n = timed_reps(per_video_once, cap_s=90.0)
        note(fused_variant="per_video_8_dispatches",
             fps=round(F / dt, 1), reps=n, floor_ms=floor_ms(),
             videos=V, frames_per_video=F_V)

    extra("concat_videos", 240, concat)

    # ---- STREAMING / ONLINE latency (VERDICT r4 item 2): per-frame
    # steady-state latency of the online engine's device programs
    # (engine/video.py feeds frames one at a time). Reports wall-clock
    # p50 per frame AND the dispatch floor measured next to it: on this
    # tunneled chip the floor (~25 ms) dominates; on a real TPU host
    # dispatch is ~0.1-0.5 ms, so device compute = the floor-subtracted
    # delta (the BASELINE.md micro-bench methodology).
    def streaming():
        detect_1 = make_yolox_detect_fn(
            model, variables, conf_threshold=conf_cal,
            iou_threshold=0.65, max_dets=cfg.max_dets,
            compute_dtype=jnp.bfloat16)

        # fused per-frame step: detect one frame + one tracker step
        @jax.jit
        def stream_step(state, frame):
            dets = detect_1(frame[None], None)
            d1 = jax.tree_util.tree_map(lambda v: v[0], dets)
            state, out = ocsort_step(cfg, state, d1)
            return state, out.valid

        state = ocsort_init(cfg)
        state, ov = stream_step(state, video[0])
        np.asarray(ov).sum()  # compile

        def p50(step_fn, state, frames, n=30):
            ts = []
            for i in range(n):
                t = time.perf_counter()
                state, ov = step_fn(state, frames[i % frames.shape[0]])
                np.asarray(ov).sum()
                ts.append(time.perf_counter() - t)
            return sorted(ts)[len(ts) // 2] * 1000, state

        ms, state = p50(stream_step, state, video[:64])
        fl = floor_ms()
        note(streaming="fused_detect_track_step",
             ms_per_frame_p50=round(ms, 2), floor_ms=fl,
             device_ms_est=round(max(ms - fl, 0.0), 2))

        # tracker-only per-frame step (the online tracker module alone)
        @jax.jit
        def trk_step(state, d):
            state, out = ocsort_step(cfg, state, d)
            return state, out.valid

        dets_s = tracker_stream(64, 20, cfg.max_dets, seed=7)
        one = jax.tree_util.tree_map(lambda v: v[0], dets_s)
        tstate = ocsort_init(cfg)
        tstate, ov = trk_step(tstate, one)
        np.asarray(ov).sum()
        ts = []
        for i in range(30):
            d = jax.tree_util.tree_map(lambda v: v[i % 64], dets_s)
            t = time.perf_counter()
            tstate, ov = trk_step(tstate, d)
            np.asarray(ov).sum()
            ts.append(time.perf_counter() - t)
        ms_t = sorted(ts)[len(ts) // 2] * 1000
        fl = floor_ms()
        note(streaming="tracker_only_step",
             ms_per_frame_p50=round(ms_t, 2), floor_ms=fl,
             device_ms_est=round(max(ms_t - fl, 0.0), 2))

    extra("streaming_latency", 120, streaming)

    # ---- optional: chunk-size sweep for the fused reid/pose shapes
    # (VERDICT r4 item 8) — each point is a fresh program compile, so
    # this is opt-in; results recorded in BASELINE.md, best point wired
    # as the section default above.
    def sweep():
        for c in (32, 64, 128):
            os.environ["TRACKLAB_TPU_REID_CHUNK"] = str(c)
            extra(f"reid_sweep_{c}", 180, reid)
        for c in (32, 64, 128):
            os.environ["TRACKLAB_TPU_POSE_CHUNK"] = str(c)
            extra(f"pose_sweep_{c}", 180, pose)

    if os.environ.get("TRACKLAB_TPU_BENCH_SWEEP"):
        extra("chunk_sweep", 600, sweep)

    # ---- optional: int8 PTQ detector (models/quantize.py). Measured a
    # NON-win via XLA in r3 (BASELINE.md) — kept reproducible, gated.
    def int8():
        from tracklab_tpu.models.quantize import calibrate_int8

        calib = YOLOX(num_classes=1, variant="s", quant="calib")
        qvars = calibrate_int8(
            calib, variables, [np.asarray(video[:8], np.float32)])
        int8_model = YOLOX(num_classes=1, variant="s", quant="int8",
                           dtype=jnp.bfloat16)

        def detect_q(imgs):
            imgs = imgs.astype(jnp.bfloat16)
            decoded = int8_model.apply(qvars, imgs,
                                       method=YOLOX.predict)
            return postprocess_detections(decoded, conf_threshold=0.3,
                                          max_out=32)

        det_q = jax.jit(detect_q)
        np.asarray(det_q(images)["valid"]).sum()
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(det_q(images)["valid"]).sum()
        dt_q = (time.perf_counter() - t0) / reps
        note(detector_int8_fps=round(BATCH / dt_q, 1),
             detector_bf16_fps=round(det_fps, 1))
        detq_fn = make_yolox_detect_fn(
            int8_model, qvars, conf_threshold=conf_cal,
            iou_threshold=0.65, max_dets=cfg.max_dets,
            compute_dtype=jnp.bfloat16)
        fused_q = jax.jit(lambda f: fused_detect_track(
            detq_fn, partial(ocsort_step, cfg), ocsort_init(cfg), f,
            chunk=BATCH, return_detections=False))
        bench_calls(lambda v: fused_q(v)[2], video, F,
                    "int8_coherent_20obj")

    if os.environ.get("TRACKLAB_TPU_BENCH_INT8"):
        extra("int8", 300, int8)

    note(phase="done")


if __name__ == "__main__":
    sys.exit(main())
