"""Benchmark harness — run on real TPU by the driver.

End-to-end tracked FPS per chip, MEASURED on the fused device program
(engine/fused.py): uint8 frames -> YOLOX-s bf16 -> NMS -> padded
Detections -> OC-SORT scan, one lax.scan over frame chunks carrying
tracker state — a single XLA dispatch per video. This is the BASELINE.md
primary metric ("end-to-end tracked FPS per chip", target >= 300 on
v5e). Stage micro-rates (detector-only, tracker-only) go to stderr.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

os.makedirs("/tmp/jax_cache", exist_ok=True)

import numpy as np

TARGET_FPS = 300.0  # BASELINE.json north-star: >=300 FPS/chip on v5e


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

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from tracklab_tpu.engine.fused import (fused_detect_track,
                                           make_yolox_detect_fn)
    from tracklab_tpu.models.yolox import YOLOX
    from tracklab_tpu.ops.nms import postprocess_detections
    from tracklab_tpu.trackers.ocsort import (OCSortConfig, ocsort_init,
                                              ocsort_scan, ocsort_step)

    # ---- detector stage: YOLOX-s bf16, batch of frames, pipelined
    # dispatch (the production streaming shape: the host queues the next
    # batch while the device runs the current one) ----
    BATCH = 384  # r2 sweep with bf16 activations + uint8 staging:
    # bs=256 2165, bs=320 2182, bs=384 2371 img/s (still HBM-bound;
    # bs=512 compile hung historically, 384 compiles in ~1 min on a
    # warm lower-layer cache). NMS postprocess is a net WIN: it shrinks
    # the program output from the 51 MB decoded tensor to fixed
    # (B, 32) detections (materializing raw decode measured SLOWER:
    # 1382 img/s)
    H = W = 640
    model = YOLOX(num_classes=1, variant="s", dtype=jnp.bfloat16)
    # stage frames as uint8 (the camera-native dtype): the detector is
    # HBM-bandwidth bound, and reading the input batch at 0.3 GB
    # instead of 1.2 GB (f32) trims the dominant term; the cast to
    # bf16 happens on device inside the jitted program
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (BATCH, H, W, 3)),
        jnp.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), train=False)

    def detect(imgs):
        imgs = imgs.astype(jnp.bfloat16)
        decoded = model.apply(variables, imgs, method=YOLOX.predict)
        return postprocess_detections(decoded, conf_threshold=0.3,
                                      max_out=32)

    # NOTE: timings force a host transfer per rep (np.asarray) because
    # block_until_ready is unreliable through remote-device tunnels.
    det_fn = jax.jit(detect)
    np.asarray(det_fn(images)["valid"]).sum()
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(det_fn(images)["valid"]).sum()
    det_dt = (time.perf_counter() - t0) / reps
    det_fps = BATCH / det_dt

    # ---- tracker stage (micro): OC-SORT scan over a full video ----
    n_frames = 512
    cfg = OCSortConfig(max_tracks=64, max_dets=32, min_hits=1)
    dets = tracker_stream(n_frames, 20, cfg.max_dets)
    scan = jax.jit(lambda d: ocsort_scan(cfg, d))
    _, o = scan(dets)
    np.asarray(o.valid).sum()
    t0 = time.perf_counter()
    for _ in range(reps):
        _, o = scan(dets)
        np.asarray(o.valid).sum()
    trk_dt = (time.perf_counter() - t0) / reps
    trk_fps = n_frames / trk_dt

    # ---- THE e2e metric: the fused single-program pipeline ----
    # frames -> detector -> NMS -> tracker state carried across chunks,
    # one dispatch for the whole video (VERDICT r2 item 1: measured, not
    # a derived harmonic of the two stage rates).
    #
    # Workload realism: the video is quasi-static (base frame + small
    # temporal noise), so the random-weight detector's NMS output is
    # frame-COHERENT — detections persist and match across frames like
    # real MOT objects (a 30 fps pedestrian moves ~3% of its box per
    # frame). An i.i.d.-random video instead yields 32 UNMATCHABLE new
    # boxes every frame — max-birth/max-association saturation, the
    # adversarial worst case, reported separately below. The NMS
    # threshold is auto-calibrated so ~20 detections/frame survive:
    # the same 20-object load as the tracker micro-bench and the r2
    # derived headline (BASELINE.md), making the numbers comparable.
    n_chunks = 4
    F = n_chunks * BATCH  # 1536 frames ~ one MOT17 video, 1.8 GB uint8
    rng1 = np.random.default_rng(1)
    base = rng1.integers(0, 235, (1, H, W, 3))
    video = jnp.asarray(base + rng1.integers(0, 20, (F, H, W, 3)),
                        jnp.uint8)
    # calibrate: threshold between the 20th and 21st best score on the
    # base frame (deterministic seed + weights -> stable across runs,
    # so the jitted program hash stays cacheable)
    probe = model.apply(variables, video[:1].astype(jnp.bfloat16),
                        method=YOLOX.predict)
    s = np.asarray(probe[0, :, 4] * probe[0, :, 5:].max(-1))
    top = np.sort(s)[::-1]
    conf_cal = float(round((top[19] + top[20]) / 2, 6))

    def run_fused(video, conf, tag):
        detect_fn = make_yolox_detect_fn(
            model, variables, conf_threshold=conf, iou_threshold=0.65,
            max_dets=cfg.max_dets, compute_dtype=jnp.bfloat16)
        fused = jax.jit(lambda f: fused_detect_track(
            detect_fn, partial(ocsort_step, cfg), ocsort_init(cfg), f,
            chunk=BATCH, return_detections=False))
        _, _, out = fused(video)
        per_frame = float(np.asarray(out.valid).sum(1).mean())
        t0 = time.perf_counter()
        for _ in range(reps):
            _, _, out = fused(video)
            np.asarray(out.valid).sum()
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"fused_variant": tag,
                          "fps": round(F / dt, 1),
                          "tracks_per_frame": round(per_frame, 1)}),
              file=sys.stderr)
        return F / dt

    e2e_fps = run_fused(video, conf_cal, "coherent_20obj")
    # adversarial saturation: i.i.d. frames -> 32 incoherent dets/frame,
    # max births + full-capacity association every frame
    video_iid = jnp.asarray(
        np.random.default_rng(2).integers(0, 255, (F, H, W, 3)),
        jnp.uint8)
    sat_fps = run_fused(video_iid, 0.3, "saturated_worst_case")

    # ---- optional: fused detect->ReID->track (BASELINE config 2:
    # YOLOX + OSNet + StrongSORT as ONE device program). Gated behind an
    # env flag so the driver's default bench stays bounded — the OSNet
    # stage embeds every detection slot (chunk x max_dets crops), a
    # second large program to compile. Run with
    # TRACKLAB_TPU_BENCH_REID=1; measured numbers live in BASELINE.md.
    if os.environ.get("TRACKLAB_TPU_BENCH_REID"):
        from tracklab_tpu.engine.fused import (fused_detect_reid_track,
                                               make_osnet_embed_fn)
        from tracklab_tpu.models.osnet import OSNet
        from tracklab_tpu.trackers.strongsort import (
            StrongSortConfig, strongsort_init, strongsort_step)

        # chunk sized by the crop buffer: chunk x 32 crops of 256x128
        # bf16 = ~1.2 GB at chunk=64 — the detector prefers bigger
        # batches but the ReID stage dominates FLOPs anyway
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
        scfg = StrongSortConfig(max_tracks=64, max_dets=R_DETS,
                                n_init=1)
        F_R = 8 * R_CHUNK
        fused_r = jax.jit(lambda f: fused_detect_reid_track(
            detect_r, embed, partial(strongsort_step, scfg),
            strongsort_init(scfg), f, chunk=R_CHUNK,
            min_confidence=0.4, embed_dim=512,
            return_detections=False))
        vid_r = video[:F_R]
        _, _, _, out_r = fused_r(vid_r)
        per_frame_r = float(np.asarray(out_r.valid).sum(1).mean())
        t0 = time.perf_counter()
        for _ in range(reps):
            _, _, _, out_r = fused_r(vid_r)
            np.asarray(out_r.valid).sum()
        dt_r = (time.perf_counter() - t0) / reps
        print(json.dumps({"fused_variant": "detect_reid_track",
                          "fps": round(F_R / dt_r, 1),
                          "chunk": R_CHUNK,
                          "tracks_per_frame": round(per_frame_r, 1)}),
              file=sys.stderr)

    # ---- optional: int8 PTQ detector (models/quantize.py — s8xs8->s32
    # MXU convs, activation scales calibrated on sample frames). On v5e
    # the MXU runs int8 at 2x the bf16 rate and int8 activations halve
    # the HBM term again; this measures how much of that lands through
    # XLA. Run with TRACKLAB_TPU_BENCH_INT8=1.
    if os.environ.get("TRACKLAB_TPU_BENCH_INT8"):
        from tracklab_tpu.models.quantize import calibrate_int8

        calib = YOLOX(num_classes=1, variant="s", quant="calib")
        qvars = calibrate_int8(
            calib, variables,
            [np.asarray(video[:8], np.float32)])
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
        print(json.dumps({"detector_int8_fps": round(BATCH / dt_q, 1),
                          "detector_bf16_fps": round(det_fps, 1)}),
              file=sys.stderr)
        # fused e2e with the quantized detector
        detq_fn = make_yolox_detect_fn(
            int8_model, qvars, conf_threshold=conf_cal,
            iou_threshold=0.65, max_dets=cfg.max_dets,
            compute_dtype=jnp.bfloat16)
        fused_q = jax.jit(lambda f: fused_detect_track(
            detq_fn, partial(ocsort_step, cfg), ocsort_init(cfg), f,
            chunk=BATCH, return_detections=False))
        _, _, out_q = fused_q(video)
        t0 = time.perf_counter()
        for _ in range(reps):
            _, _, out_q = fused_q(video)
            np.asarray(out_q.valid).sum()
        dt_q = (time.perf_counter() - t0) / reps
        print(json.dumps({"fused_variant": "int8_coherent_20obj",
                          "fps": round(F / dt_q, 1)}), file=sys.stderr)

    # ---- optional: fused detect->pose->track (the PoseTrack pipeline
    # shape: YOLOX + top-down CSP pose on 32 crop slots + OC-SORT as ONE
    # program). Run with TRACKLAB_TPU_BENCH_POSE=1.
    if os.environ.get("TRACKLAB_TPU_BENCH_POSE"):
        from tracklab_tpu.engine.fused import (fused_detect_pose_track,
                                               make_topdown_pose_fn)
        from tracklab_tpu.models.pose import TopDownPose

        P_CHUNK = int(os.environ.get("TRACKLAB_TPU_POSE_CHUNK", "64"))
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
            return_detections=False))
        vid_p = video[:F_P]
        _, _, kp_p, out_p = fused_p(vid_p)
        np.asarray(out_p.valid).sum()
        t0 = time.perf_counter()
        for _ in range(reps):
            _, _, kp_p, out_p = fused_p(vid_p)
            np.asarray(out_p.valid).sum()
        dt_p = (time.perf_counter() - t0) / reps
        print(json.dumps({"fused_variant": "detect_pose_track",
                          "fps": round(F_P / dt_p, 1),
                          "chunk": P_CHUNK}), file=sys.stderr)

    # ---- optional: the FULL GSR prefix fused — detect -> top-down pose
    # -> keypoint-PROMPTED KPR (ViT-B 384x128, cck6 prompts rasterized on
    # device) -> OKS BPBReID-StrongSORT, ONE program. The reference's
    # flagship game-state pipeline runs these as four torch modules
    # through pandas. Run with TRACKLAB_TPU_BENCH_GSR=1.
    if os.environ.get("TRACKLAB_TPU_BENCH_GSR"):
        from tracklab_tpu.engine.fused import (fused_detect_parts_track,
                                               make_kpr_embed_fn,
                                               make_topdown_pose_fn)
        from tracklab_tpu.models.kpr import KPR
        from tracklab_tpu.models.pose import TopDownPose
        from tracklab_tpu.trackers.bpbreid_strongsort import (
            BPBReIDStrongSortConfig, bpbreid_init, bpbreid_step)

        G_CHUNK = int(os.environ.get("TRACKLAB_TPU_GSR_CHUNK", "16"))
        G_DETS = 32
        kpr = KPR(dtype=jnp.bfloat16)       # ViT-B/16 384x128, 5 parts
        kvars = kpr.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 384, 128, 3)),
                         jnp.zeros((1, 384, 128, 7)), train=False)
        embed_g = make_kpr_embed_fn(kpr, kvars, crop_size=(384, 128),
                                    compute_dtype=jnp.bfloat16)
        pmodel_g = TopDownPose(num_keypoints=17, variant="s",
                               dtype=jnp.bfloat16)
        pvars_g = pmodel_g.init(jax.random.PRNGKey(4),
                                jnp.zeros((1, 256, 192, 3)),
                                train=False)
        pose_g = make_topdown_pose_fn(pmodel_g, pvars_g,
                                      crop_size=(256, 192),
                                      compute_dtype=jnp.bfloat16)
        detect_g = make_yolox_detect_fn(
            model, variables, conf_threshold=conf_cal,
            iou_threshold=0.65, max_dets=G_DETS,
            compute_dtype=jnp.bfloat16)
        gcfg = BPBReIDStrongSortConfig(
            motion_criterium="oks", n_parts=6, embed_dim=512,
            n_init=1, max_tracks=64, max_dets=G_DETS)
        F_G = 8 * G_CHUNK
        fused_g = jax.jit(lambda f: fused_detect_parts_track(
            detect_g, embed_g, partial(bpbreid_step, gcfg),
            bpbreid_init(gcfg), f, chunk=G_CHUNK, min_confidence=0.4,
            n_parts=6, embed_dim=512, n_keypoints=17, pose_fn=pose_g,
            return_detections=False))
        vid_g = video[:F_G]
        _, _, _, _, out_g = fused_g(vid_g)
        np.asarray(out_g.valid).sum()
        t0 = time.perf_counter()
        for _ in range(reps):
            _, _, _, _, out_g = fused_g(vid_g)
            np.asarray(out_g.valid).sum()
        dt_g = (time.perf_counter() - t0) / reps
        print(json.dumps({"fused_variant": "detect_pose_kpr_bpbreid",
                          "fps": round(F_G / dt_g, 1),
                          "chunk": G_CHUNK}), file=sys.stderr)

    print(json.dumps({
        "metric": "e2e_detect_track_fps_per_chip",
        "value": round(e2e_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(e2e_fps / TARGET_FPS, 3),
    }))
    print(json.dumps({
        "detector_fps": round(det_fps, 1),
        "tracker_scan_fps": round(trk_fps, 1),
        "e2e_mode": "fused_single_program",
        "e2e_frames": F,
        "e2e_chunk": BATCH,
        "saturated_worst_case_fps": round(sat_fps, 1),
    }), file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
