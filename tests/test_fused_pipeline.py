"""Fused detect->NMS->track device program == the staged module path.

VERDICT r2 item 1: the e2e headline must be a *measured fused program*,
not a derived composition — and its outputs must match the
module-by-module path bit-for-bit. These tests pin that equivalence on
CPU with a tiny random-weight YOLOX (nano, 128x128) so no TPU or
checkpoint is needed.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracklab_tpu.engine.fused import (fused_detect_track,
                                       make_yolox_detect_fn)
from tracklab_tpu.trackers.common import Detections
from tracklab_tpu.trackers.ocsort import (OCSortConfig, ocsort_init,
                                          ocsort_scan, ocsort_step)


@pytest.fixture(scope="module")
def tiny_yolox():
    from tracklab_tpu.models.yolox import YOLOX
    model = YOLOX(num_classes=1, variant="nano")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3), jnp.float32),
                           train=False)
    return model, variables


def _frames(n, h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 255, (n, h, w, 3)), jnp.uint8)


def _static_frames(n, h=128, w=128, seed=0):
    """Quasi-static video: one random frame + small per-frame jitter, so
    the random-weight detector emits coherent boxes that an association
    tracker can actually link (i.i.d. noise frames give i.i.d. boxes —
    StrongSORT then never confirms a track; see bench.py)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(8, 247, (1, h, w, 3))
    jitter = rng.integers(-4, 5, (n, h, w, 3))
    return jnp.asarray(np.clip(base + jitter, 0, 255), jnp.uint8)


def test_fused_equals_staged(tiny_yolox):
    """One fused program == detect-all-frames then scan, frame for frame."""
    model, variables = tiny_yolox
    F, chunk, D = 8, 4, 16
    frames = _frames(F)
    detect = make_yolox_detect_fn(model, variables, conf_threshold=0.3,
                                  max_dets=D)
    cfg = OCSortConfig(max_tracks=32, max_dets=D, min_hits=1,
                       det_thresh=0.1)

    # staged: detector batched per chunk (same batch shape as the fused
    # body so XLA numerics agree), detections concatenated, one scan
    det_jit = jax.jit(lambda f: detect(f, None))
    staged_dets = [det_jit(frames[i:i + chunk]) for i in range(0, F, chunk)]
    staged_dets = Detections(*[
        jnp.concatenate([getattr(d, f) for d in staged_dets])
        for f in Detections._fields])
    _, staged_out = jax.jit(lambda d: ocsort_scan(cfg, d))(staged_dets)

    fused = jax.jit(lambda f: fused_detect_track(
        detect, partial(ocsort_step, cfg), ocsort_init(cfg), f, chunk))
    _, fused_dets, fused_out = fused(frames)

    assert bool(jnp.any(staged_dets.valid)), "random net found no dets"
    assert bool(jnp.any(staged_out.valid)), "tracker emitted nothing"
    np.testing.assert_array_equal(np.asarray(fused_dets.valid),
                                  np.asarray(staged_dets.valid))
    np.testing.assert_allclose(np.asarray(fused_dets.ltrb),
                               np.asarray(staged_dets.ltrb),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fused_out.valid),
                                  np.asarray(staged_out.valid))
    np.testing.assert_array_equal(np.asarray(fused_out.track_id),
                                  np.asarray(staged_out.track_id))
    np.testing.assert_allclose(np.asarray(fused_out.ltrb),
                               np.asarray(staged_out.ltrb),
                               rtol=1e-5, atol=1e-4)


def test_fused_frame_valid_masks_padded_tail(tiny_yolox):
    """Padded tail frames contribute no detections, matching the staged
    path's frame bucketing (scan_tracker._pad_video)."""
    model, variables = tiny_yolox
    F, chunk, D = 8, 4, 16
    real = 6
    frames = _frames(F)
    detect = make_yolox_detect_fn(model, variables, conf_threshold=0.3,
                                  max_dets=D)
    cfg = OCSortConfig(max_tracks=32, max_dets=D, min_hits=1,
                       det_thresh=0.1)
    fv = jnp.arange(F) < real
    _, dets, out = jax.jit(lambda f, v: fused_detect_track(
        detect, partial(ocsort_step, cfg), ocsort_init(cfg), f, chunk,
        frame_valid=v))(frames, fv)
    assert not bool(jnp.any(dets.valid[real:]))
    assert not bool(jnp.any(out.valid[real:]))


def test_fused_meta_rescale_matches_host_wrapper(tiny_yolox):
    """Device-side unletterbox+clip == the host wrapper math
    (wrappers/bbox_detector/yolox_api.py:121-130)."""
    model, variables = tiny_yolox
    F, chunk, D = 4, 4, 16
    frames = _frames(F, seed=3)
    detect = make_yolox_detect_fn(model, variables, conf_threshold=0.3,
                                  max_dets=D)
    rng = np.random.default_rng(1)
    scale = rng.uniform(0.4, 0.9, F).astype(np.float32)
    pad = rng.uniform(0, 20, (F, 2)).astype(np.float32)
    shape = np.stack([np.full(F, 150.0), np.full(F, 110.0)],
                     axis=1).astype(np.float32)
    meta = dict(scale=jnp.asarray(scale), pad=jnp.asarray(pad),
                shape=jnp.asarray(shape))

    raw = jax.jit(lambda f: detect(f, None))(frames)
    scaled = jax.jit(lambda f, m: detect(f, m))(frames, meta)

    ltrb = np.asarray(raw.ltrb)
    valid = np.asarray(raw.valid)
    exp_ltrb = np.zeros_like(ltrb)
    exp_valid = np.zeros_like(valid)
    for i in range(F):
        for d in range(D):
            box = ltrb[i, d].copy()
            box[0::2] = (box[0::2] - pad[i, 0]) / scale[i]
            box[1::2] = (box[1::2] - pad[i, 1]) / scale[i]
            box[0::2] = np.clip(box[0::2], 0, shape[i, 0])
            box[1::2] = np.clip(box[1::2], 0, shape[i, 1])
            exp_ltrb[i, d] = box
            wh = box[2:] - box[:2]
            exp_valid[i, d] = valid[i, d] and wh[0] > 0 and wh[1] > 0
    np.testing.assert_array_equal(np.asarray(scaled.valid), exp_valid)
    np.testing.assert_allclose(np.asarray(scaled.ltrb), exp_ltrb,
                               rtol=1e-5, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_osnet():
    from tracklab_tpu.models.osnet import OSNet
    model = OSNet(variant="x0_25", feat_dim=64, n_parts=2)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 32, 16, 3), jnp.float32),
                           train=False)
    return model, variables


def test_fused_reid_equals_staged(tiny_yolox, tiny_osnet):
    """Fused detect -> device crops -> embed -> StrongSORT == the staged
    semantics: per-chunk detect + embed, the wrapper's min_confidence
    row-drop-and-repack (scan_tracker.process) and embed_dim slice/pad
    (_collect_embeddings), then one whole-video 3-input scan. Pins that
    the fused path's mask-instead-of-drop is slot-for-slot equivalent
    (NMS output is score-descending, so surviving rows are a prefix)."""
    from tracklab_tpu.engine.fused import (fused_detect_reid_track,
                                           make_osnet_embed_fn)
    from tracklab_tpu.trackers.strongsort import (
        StrongSortConfig, strongsort_init, strongsort_scan,
        strongsort_step)

    det_model, det_vars = tiny_yolox
    reid_model, reid_vars = tiny_osnet
    F, chunk, D, E = 8, 4, 12, 48
    frames = _static_frames(F, seed=11)
    detect = make_yolox_detect_fn(det_model, det_vars,
                                  conf_threshold=0.25, max_dets=D)
    embed = make_osnet_embed_fn(reid_model, reid_vars,
                                crop_size=(32, 16))
    cfg = StrongSortConfig(max_tracks=16, max_dets=D, embed_dim=E,
                           n_init=1, max_dist=0.6, max_iou_dist=0.9)

    # ---- staged: chunked detect + embed (same batch shapes as the
    # fused body so XLA numerics agree), wrapper-style row drop ----
    det_jit = jax.jit(lambda f: detect(f, None))
    emb_jit = jax.jit(lambda f, b: embed(f, b)["embeddings"])
    dets_l, emb_l = [], []
    for i in range(0, F, chunk):
        d = det_jit(frames[i:i + chunk])
        emb_l.append(emb_jit(frames[i:i + chunk], d.ltrb))
        dets_l.append(d)
    sd = Detections(*[jnp.concatenate([getattr(d, f_) for d in dets_l])
                      for f_ in Detections._fields])
    se = np.asarray(jnp.concatenate(emb_l))          # (F, D, E0)
    E0 = se.shape[-1]
    # the tracker pre-filter at the median valid score: every frame has
    # detections on BOTH sides of it, so the fused path's
    # mask-instead-of-drop is genuinely exercised (random-weight score
    # distributions shift with jax_enable_x64, so a constant is brittle)
    min_conf = float(np.median(np.asarray(sd.conf)[np.asarray(sd.valid)]))

    ltrb = np.zeros((F, D, 4), np.float32)
    conf = np.zeros((F, D), np.float32)
    cls = np.zeros((F, D), np.float32)
    ref = np.full((F, D), -1, np.int32)
    valid = np.zeros((F, D), bool)
    emb_in = np.zeros((F, D, E), np.float32)
    sv, sc = np.asarray(sd.valid), np.asarray(sd.conf)
    for f in range(F):
        keep = np.nonzero(sv[f] & (sc[f] > min_conf))[0]
        n = len(keep)
        np.testing.assert_array_equal(
            keep, np.arange(n),
            err_msg="NMS output not score-descending: prefix broken")
        ltrb[f, :n] = np.asarray(sd.ltrb)[f, keep]
        conf[f, :n] = sc[f, keep]
        cls[f, :n] = np.asarray(sd.cls)[f, keep]
        ref[f, :n] = f * D + keep
        valid[f, :n] = True
        emb_in[f, :n, :min(E0, E)] = se[f, keep, :min(E0, E)]
    staged_in = Detections(jnp.asarray(ltrb), jnp.asarray(conf),
                           jnp.asarray(cls), jnp.asarray(ref),
                           jnp.asarray(valid))
    _, staged_out = jax.jit(lambda d, e: strongsort_scan(cfg, d, e))(
        staged_in, jnp.asarray(emb_in))

    fused = jax.jit(lambda f: fused_detect_reid_track(
        detect, embed, partial(strongsort_step, cfg),
        strongsort_init(cfg), f, chunk, min_confidence=min_conf,
        embed_dim=E, return_embeddings=True))
    _, fdets, freid, fused_out = fused(frames)

    assert bool(jnp.any(staged_in.valid)), "no detections above min_conf"
    assert bool(jnp.any(staged_out.valid)), "tracker emitted nothing"
    ov = np.asarray(staged_out.valid)
    np.testing.assert_array_equal(np.asarray(fused_out.valid), ov)
    np.testing.assert_array_equal(
        np.asarray(fused_out.track_id)[ov],
        np.asarray(staged_out.track_id)[ov])
    np.testing.assert_array_equal(np.asarray(fused_out.ref)[ov],
                                  np.asarray(staged_out.ref)[ov])
    np.testing.assert_allclose(np.asarray(fused_out.ltrb)[ov],
                               np.asarray(staged_out.ltrb)[ov],
                               rtol=1e-4, atol=1e-3)
    # the full ReID output is exported for the reid module's DataFrame:
    # valid detector slots carry the staged embeddings, invalid are 0
    fe = np.asarray(freid["embeddings"])
    np.testing.assert_allclose(fe[sv], se[sv], rtol=1e-4, atol=1e-4)
    assert not np.any(fe[~sv])


def test_fused_reid_embed_buckets_exact(tiny_yolox, tiny_osnet):
    """Live-prefix bucketed embedding (embed_buckets) is output-identical
    to embedding every slot: slots beyond the chunk's max live count are
    zeroed either way (VERDICT r3 item 2's compaction lever — the JV
    column-compaction idea applied to the ReID stage)."""
    from tracklab_tpu.engine.fused import (fused_detect_reid_track,
                                           make_osnet_embed_fn)
    from tracklab_tpu.trackers.strongsort import (
        StrongSortConfig, strongsort_init, strongsort_step)

    det_model, det_vars = tiny_yolox
    reid_model, reid_vars = tiny_osnet
    F, chunk, D, E = 8, 4, 12, 48
    frames = _static_frames(F, seed=11)
    # calibrate the detector threshold so the live prefix is non-trivial
    # (~D/2): random-weight score distributions shift across precisions,
    # a constant threshold is brittle (CLAUDE.md r3 note)
    probe = make_yolox_detect_fn(det_model, det_vars,
                                 conf_threshold=0.0, max_dets=D)
    pd_ = jax.jit(lambda f: probe(f, None))(frames)
    scores = np.sort(np.asarray(pd_.conf)[np.asarray(pd_.valid)])[::-1]
    conf_cal = float(scores[min(F * D // 2, len(scores) - 1)])
    detect = make_yolox_detect_fn(det_model, det_vars,
                                  conf_threshold=conf_cal, max_dets=D)
    embed = make_osnet_embed_fn(reid_model, reid_vars,
                                crop_size=(32, 16))
    cfg = StrongSortConfig(max_tracks=16, max_dets=D, embed_dim=E,
                           n_init=1, max_dist=0.6, max_iou_dist=0.9)

    def run(buckets):
        fused = jax.jit(lambda f: fused_detect_reid_track(
            detect, embed, partial(strongsort_step, cfg),
            strongsort_init(cfg), f, chunk, min_confidence=0.3,
            embed_dim=E, embed_buckets=buckets,
            return_embeddings=True))
        return fused(frames)

    _, d0, e0, o0 = run(None)
    live = int(np.asarray(d0.valid).sum(1).max())
    assert 0 < live < D, f"need a non-trivial live prefix, got {live}"
    _, d1, e1, o1 = run((4, 8, D))

    np.testing.assert_array_equal(np.asarray(d1.valid),
                                  np.asarray(d0.valid))
    np.testing.assert_allclose(np.asarray(e1["embeddings"]),
                               np.asarray(e0["embeddings"]),
                               rtol=1e-5, atol=1e-6)
    ov = np.asarray(o0.valid)
    np.testing.assert_array_equal(np.asarray(o1.valid), ov)
    np.testing.assert_array_equal(np.asarray(o1.track_id)[ov],
                                  np.asarray(o0.track_id)[ov])
    np.testing.assert_allclose(np.asarray(o1.ltrb)[ov],
                               np.asarray(o0.ltrb)[ov],
                               rtol=1e-5, atol=1e-4)

    def test_bad_buckets():
        with pytest.raises(ValueError, match="embed_buckets"):
            run((4, 8))  # must end at max_dets
    test_bad_buckets()


def test_fused_pose_buckets_exact(tiny_yolox):
    """pose_buckets live-prefix compaction is output-identical for the
    detect->pose->track program (same proof as embed_buckets)."""
    from tracklab_tpu.engine.fused import (fused_detect_pose_track,
                                           make_topdown_pose_fn)
    from tracklab_tpu.models.pose import TopDownPose
    from tracklab_tpu.trackers.ocsort import (OCSortConfig, ocsort_init,
                                              ocsort_step)

    det_model, det_vars = tiny_yolox
    F, chunk, D = 8, 4, 12
    frames = _static_frames(F, seed=11)
    probe = make_yolox_detect_fn(det_model, det_vars,
                                 conf_threshold=0.0, max_dets=D)
    pd_ = jax.jit(lambda f: probe(f, None))(frames)
    scores = np.sort(np.asarray(pd_.conf)[np.asarray(pd_.valid)])[::-1]
    conf_cal = float(scores[min(F * D // 2, len(scores) - 1)])
    detect = make_yolox_detect_fn(det_model, det_vars,
                                  conf_threshold=conf_cal, max_dets=D)
    pmodel = TopDownPose(num_keypoints=5, variant="nano")
    pvars = pmodel.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 64, 48, 3)), train=False)
    pose_fn = make_topdown_pose_fn(pmodel, pvars, crop_size=(64, 48),
                                   num_keypoints=5)
    cfg = OCSortConfig(max_tracks=16, max_dets=D, min_hits=1)

    def run(buckets):
        fused = jax.jit(lambda f: fused_detect_pose_track(
            detect, pose_fn, partial(ocsort_step, cfg),
            ocsort_init(cfg), f, chunk, min_confidence=0.2,
            pose_buckets=buckets))
        return fused(frames)

    _, d0, kp0, o0 = run(None)
    live = int(np.asarray(d0.valid).sum(1).max())
    assert 0 < live < D, f"need a non-trivial live prefix, got {live}"
    _, d1, kp1, o1 = run((4, 8, D))
    np.testing.assert_allclose(np.asarray(kp1), np.asarray(kp0),
                               rtol=1e-5, atol=1e-5)
    ov = np.asarray(o0.valid)
    np.testing.assert_array_equal(np.asarray(o1.valid), ov)
    np.testing.assert_array_equal(np.asarray(o1.track_id)[ov],
                                  np.asarray(o0.track_id)[ov])


@pytest.mark.parametrize("with_pose", [False, True])
def test_fused_parts_buckets_exact(tiny_yolox, with_pose):
    """embed_buckets live-prefix compaction is output-identical for the
    KPR parts program — promptless (detect->KPR->BPBReID) and the FULL
    prompted shape (detect->pose->KPR->OKS-BPBReID), where the pose and
    KPR stages are compacted together inside ONE lax.switch."""
    from tracklab_tpu.engine.fused import (fused_detect_parts_track,
                                           make_kpr_embed_fn,
                                           make_topdown_pose_fn)
    from tracklab_tpu.models.kpr import KPR
    from tracklab_tpu.trackers.bpbreid_strongsort import (
        BPBReIDStrongSortConfig, bpbreid_init, bpbreid_step)

    det_model, det_vars = tiny_yolox
    F, chunk, D, K = 8, 4, 12, 5
    frames = _static_frames(F, seed=11)
    probe = make_yolox_detect_fn(det_model, det_vars,
                                 conf_threshold=0.0, max_dets=D)
    pd_ = jax.jit(lambda f: probe(f, None))(frames)
    scores = np.sort(np.asarray(pd_.conf)[np.asarray(pd_.valid)])[::-1]
    conf_cal = float(scores[min(F * D // 2, len(scores) - 1)])
    detect = make_yolox_detect_fn(det_model, det_vars,
                                  conf_threshold=conf_cal, max_dets=D)

    kpr = KPR(num_parts=2, dim_reduce_output=16, img_size=(32, 16),
              patch_size=8, stride=8, embed_dim=32, depth=1, num_heads=2)
    kvars = kpr.init(jax.random.PRNGKey(3),
                     jnp.zeros((1, 32, 16, 3)),
                     jnp.zeros((1, 32, 16, kpr.n_prompt_ch)), train=False)
    embed = make_kpr_embed_fn(kpr, kvars, crop_size=(32, 16),
                              n_prompt_ch=kpr.n_prompt_ch)

    pose_fn = None
    if with_pose:
        from tracklab_tpu.models.pose import TopDownPose
        pmodel = TopDownPose(num_keypoints=K, variant="nano")
        pvars = pmodel.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 64, 48, 3)), train=False)
        pose_fn = make_topdown_pose_fn(pmodel, pvars, crop_size=(64, 48),
                                       num_keypoints=K)

    cfg = BPBReIDStrongSortConfig(
        motion_criterium="oks" if with_pose else "iou",
        n_parts=3, embed_dim=16, n_keypoints=K,
        max_tracks=16, max_dets=D, n_init=1, max_dist=0.8)

    def run(buckets):
        fused = jax.jit(lambda f: fused_detect_parts_track(
            detect, embed, partial(bpbreid_step, cfg), bpbreid_init(cfg),
            f, chunk, min_confidence=0.2, n_parts=3, embed_dim=16,
            n_keypoints=K, pose_fn=pose_fn, embed_buckets=buckets,
            return_embeddings=True))
        return fused(frames)

    _, d0, r0, kp0, o0 = run(None)
    live = int(np.asarray(d0.valid).sum(1).max())
    assert 0 < live < D, f"need a non-trivial live prefix, got {live}"
    _, d1, r1, kp1, o1 = run((4, 8, D))

    np.testing.assert_array_equal(np.asarray(d1.valid),
                                  np.asarray(d0.valid))
    np.testing.assert_allclose(np.asarray(r1["embeddings"]),
                               np.asarray(r0["embeddings"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1["visibility"]),
                               np.asarray(r0["visibility"]),
                               rtol=1e-5, atol=1e-6)
    if with_pose:
        np.testing.assert_allclose(np.asarray(kp1), np.asarray(kp0),
                                   rtol=1e-5, atol=1e-5)
    ov = np.asarray(o0.valid)
    np.testing.assert_array_equal(np.asarray(o1.valid), ov)
    np.testing.assert_array_equal(np.asarray(o1.track_id)[ov],
                                  np.asarray(o0.track_id)[ov])
    np.testing.assert_allclose(np.asarray(o1.ltrb)[ov],
                               np.asarray(o0.ltrb)[ov],
                               rtol=1e-5, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_rtdetr():
    from tracklab_tpu.models.rtdetr_hf import RTDetrHF, RTDetrHFConfig
    cfg = RTDetrHFConfig(
        num_labels=3, d_model=32, num_queries=20, embedding_size=8,
        hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1),
        layer_type="basic", encoder_hidden_dim=32,
        encoder_in_channels=(16, 32, 64), encoder_ffn_dim=64,
        num_attention_heads=4, decoder_layers=2, decoder_ffn_dim=64,
        decoder_attention_heads=4)
    model = RTDetrHF(config=cfg, num_labels=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3), jnp.float32),
                           train=False)
    return model, variables


def test_fused_rtdetr_equals_staged(tiny_rtdetr):
    """The NMS-free RT-DETR detect_fn drives the same fused program:
    fused == staged frame-for-frame, and the device-side stretch
    unscale matches the host wrapper math
    (wrappers/bbox_detector/rtdetr_api.py:process)."""
    from tracklab_tpu.engine.fused import make_rtdetr_detect_fn
    model, variables = tiny_rtdetr
    F, chunk, D = 8, 4, 8
    frames = _frames(F, seed=7)
    detect = make_rtdetr_detect_fn(model, variables, (128, 128),
                                   conf_threshold=0.2, max_dets=D)
    rng = np.random.default_rng(2)
    scale = rng.uniform(0.5, 2.0, (F, 2)).astype(np.float32)
    shape = np.stack([np.full(F, 150.0), np.full(F, 110.0)],
                     axis=1).astype(np.float32)
    meta = dict(scale=jnp.asarray(scale),
                pad=jnp.zeros((F, 2), jnp.float32),
                shape=jnp.asarray(shape))
    cfg = OCSortConfig(max_tracks=16, max_dets=D, min_hits=1,
                       det_thresh=0.0)

    det_jit = jax.jit(lambda f, m: detect(f, m))
    staged_dets = [det_jit(frames[i:i + chunk],
                           jax.tree_util.tree_map(
                               lambda x: x[i:i + chunk], meta))
                   for i in range(0, F, chunk)]
    staged_dets = Detections(*[
        jnp.concatenate([getattr(d, f) for f in [fld] for d in
                         staged_dets])
        for fld in Detections._fields])
    _, staged_out = jax.jit(lambda d: ocsort_scan(cfg, d))(staged_dets)

    fused = jax.jit(lambda f, m: fused_detect_track(
        detect, partial(ocsort_step, cfg), ocsort_init(cfg), f, chunk,
        meta=m))
    _, fused_dets, fused_out = fused(frames, meta)

    assert bool(jnp.any(staged_dets.valid)), "no detections emitted"
    np.testing.assert_array_equal(np.asarray(fused_dets.valid),
                                  np.asarray(staged_dets.valid))
    np.testing.assert_allclose(np.asarray(fused_dets.ltrb),
                               np.asarray(staged_dets.ltrb),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fused_out.track_id),
                                  np.asarray(staged_out.track_id))

    # device unscale == host wrapper math on the raw letterbox boxes
    raw = det_jit(frames, None)
    ltrb = np.asarray(raw.ltrb)
    valid = np.asarray(raw.valid)
    got = det_jit(frames, meta)
    exp_ltrb = np.zeros_like(ltrb)
    exp_valid = np.zeros_like(valid)
    for i in range(F):
        for d in range(D):
            box = ltrb[i, d].copy()
            box[0::2] = np.clip(box[0::2] * scale[i, 0], 0, shape[i, 0])
            box[1::2] = np.clip(box[1::2] * scale[i, 1], 0, shape[i, 1])
            exp_ltrb[i, d] = box
            wh = box[2:] - box[:2]
            exp_valid[i, d] = valid[i, d] and wh[0] > 0 and wh[1] > 0
    np.testing.assert_array_equal(np.asarray(got.valid), exp_valid)
    np.testing.assert_allclose(np.asarray(got.ltrb), exp_ltrb,
                               rtol=1e-5, atol=1e-4)


def test_device_prompt_maps_match_host_rasterizer():
    """models/kpr.gaussian_prompt_maps (device, batched) reproduces the
    host prompt path exactly: reid_dataset.gaussian_keypoint_masks per
    keypoint + kpr_api._prompt_masks' cck6 group-max with the
    conf-gating rules (c <= 0 -> zero mask; group selection at
    c >= vis_thresh; negatives ungated)."""
    from tracklab_tpu.models.kpr import (PROMPT_GROUPS_CCK6,
                                         gaussian_prompt_maps)
    from tracklab_tpu.wrappers.reid.reid_dataset import (
        gaussian_keypoint_masks,
    )

    rng = np.random.default_rng(3)
    h, w = 24, 16
    vis_thresh = 0.3
    ltwh = np.array([12.0, 30.0, 40.0, 90.0], np.float32)
    ltrb = np.array([ltwh[0], ltwh[1], ltwh[0] + ltwh[2],
                     ltwh[1] + ltwh[3]], np.float32)
    kp = np.zeros((17, 3), np.float32)
    kp[:, 0] = rng.uniform(ltwh[0] - 5, ltwh[0] + ltwh[2] + 5, 17)
    kp[:, 1] = rng.uniform(ltwh[1] - 5, ltwh[1] + ltwh[3] + 5, 17)
    # confidences across all three gate regimes
    kp[:, 2] = rng.uniform(-0.2, 1.0, 17)
    kp[0, 2] = 0.0        # exactly zero -> excluded everywhere
    kp[5, 2] = 0.29       # below vis_thresh -> positive-group excluded
    kp[6, 2] = 0.3        # exactly at vis_thresh -> included (>=)
    neg = np.zeros((4, 3), np.float32)
    neg[:, 0] = rng.uniform(ltwh[0], ltwh[0] + ltwh[2], 4)
    neg[:, 1] = rng.uniform(ltwh[1], ltwh[1] + ltwh[3], 4)
    neg[:, 2] = np.array([0.1, 0.0, 0.8, -0.5], np.float32)

    # host reference (kpr_api._prompt_masks semantics)
    masks = gaussian_keypoint_masks(kp, (h, w), ltwh)
    G = len(PROMPT_GROUPS_CCK6)
    host = np.zeros((h, w, G + 1), np.float32)
    conf_ok = kp[:, 2] >= vis_thresh
    for g, idxs in enumerate(PROMPT_GROUPS_CCK6):
        idxs = [i for i in idxs if conf_ok[i]]
        if idxs:
            host[..., g] = masks[idxs].max(axis=0)
    neg_masks = gaussian_keypoint_masks(neg, (h, w), ltwh)
    host[..., G] = neg_masks.max(axis=0)

    dev = np.asarray(jax.jit(
        lambda k, b, n: gaussian_prompt_maps(
            k, b, (h, w), vis_thresh=vis_thresh, negative_kps=n)
    )(jnp.asarray(kp)[None], jnp.asarray(ltrb)[None],
      jnp.asarray(neg)[None]))[0]
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name,make", [
    ("yolox", lambda: __import__(
        "tracklab_tpu.wrappers.bbox_detector.yolox_api",
        fromlist=["YOLOXDetector"]).YOLOXDetector(
        variant="nano", num_classes=1, input_size=(64, 64),
        min_confidence=0.05, max_dets=8)),
    ("yolov8", lambda: __import__(
        "tracklab_tpu.wrappers.bbox_detector.yolov8_api",
        fromlist=["YOLOv8Detector"]).YOLOv8Detector(
        variant="n", num_classes=1, input_size=(64, 64),
        min_confidence=0.05, max_dets=8)),
    ("yolo11", lambda: __import__(
        "tracklab_tpu.wrappers.bbox_detector.yolov8_api",
        fromlist=["YOLOv8Detector"]).YOLOv8Detector(
        variant="11n", num_classes=1, input_size=(64, 64),
        min_confidence=0.05, max_dets=8)),
    ("rtmdet", lambda: __import__(
        "tracklab_tpu.wrappers.bbox_detector.rtmdet_api",
        fromlist=["RTMDetDetector"]).RTMDetDetector(
        variant="nano", num_classes=1, input_size=(64, 64),
        min_confidence=0.02, max_dets=8)),
])
def test_device_detect_fn_matches_staged_infer(name, make):
    """Every fused-capable detector family's device_detect_fn must
    reproduce its OWN staged jitted infer — including the per-family
    input preprocessing (YOLOX raw 0-255, YOLOv8/YOLO11 /255, RTMDet
    mean/std). Pins the bug class where the inherited YOLOX closure
    silently skipped a subclass's normalization in the fused engine."""
    det = make()
    det._build()
    frames = _frames(2, 64, 64, seed=13)
    staged = det._infer(frames)
    fused = jax.jit(lambda f: det.device_detect_fn()(f, None))(frames)
    np.testing.assert_array_equal(np.asarray(fused.valid),
                                  np.asarray(staged["valid"]),
                                  err_msg=name)
    v = np.asarray(staged["valid"])
    assert v.any(), f"{name}: no detections — thresholds too high"
    np.testing.assert_allclose(np.asarray(fused.ltrb)[v],
                               np.asarray(staged["ltrb"])[v],
                               rtol=1e-5, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(fused.conf)[v],
                               np.asarray(staged["score"])[v],
                               rtol=1e-5, atol=1e-5, err_msg=name)


def test_fused_concat_resets_equal_per_segment_scans(tiny_yolox):
    """TIME-CONCAT fused e2e (fused_detect_track_concat): V videos as ONE
    dispatch with tracker-state resets at video boundaries. Each
    segment's tracker output must be bit-identical to an independent
    scan over that segment's own detections — including when a video
    boundary falls MID-chunk (V=2, F=6, chunk=4: boundary at stream
    frame 6 inside chunk 1). Detections are taken from the concat
    program itself so the comparison isolates the reset semantics from
    detector batch-shape numerics."""
    from tracklab_tpu.engine.fused import fused_detect_track_concat

    model, variables = tiny_yolox
    V, F, chunk, D = 2, 6, 4, 16
    videos = jnp.stack([_static_frames(F, seed=21),
                        _static_frames(F, seed=22)])
    detect = make_yolox_detect_fn(model, variables, conf_threshold=0.25,
                                  max_dets=D)
    cfg = OCSortConfig(max_tracks=32, max_dets=D, min_hits=1,
                       det_thresh=0.1)

    _, dets, outs = jax.jit(lambda v: fused_detect_track_concat(
        detect, partial(ocsort_step, cfg), ocsort_init(cfg), v, chunk))(
        videos)

    scan = jax.jit(lambda d: ocsort_scan(cfg, d))
    for v in range(V):
        seg = Detections(*[getattr(dets, f)[v] for f in Detections._fields])
        assert bool(jnp.any(seg.valid)), f"video {v}: no detections"
        _, ref_out = scan(seg)
        assert bool(jnp.any(ref_out.valid)), f"video {v}: tracker empty"
        for f in ref_out._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(outs, f)[v]),
                np.asarray(getattr(ref_out, f)),
                err_msg=f"video {v} field {f}")


def test_fused_concat_aligned_equals_per_video_fused(tiny_yolox):
    """When video boundaries align with chunk boundaries the concat
    program is bit-identical to per-video fused_detect_track runs end to
    end (same detector batch shape -> same XLA numerics), with detection
    refs offset by the stream position (video v frame f -> (v*F+f)*D)."""
    from tracklab_tpu.engine.fused import fused_detect_track_concat

    model, variables = tiny_yolox
    V, F, chunk, D = 2, 4, 4, 16
    videos = jnp.stack([_static_frames(F, seed=31),
                        _static_frames(F, seed=32)])
    detect = make_yolox_detect_fn(model, variables, conf_threshold=0.25,
                                  max_dets=D)
    cfg = OCSortConfig(max_tracks=32, max_dets=D, min_hits=1,
                       det_thresh=0.1)

    _, dets_c, outs_c = jax.jit(lambda v: fused_detect_track_concat(
        detect, partial(ocsort_step, cfg), ocsort_init(cfg), v, chunk))(
        videos)
    one = jax.jit(lambda f: fused_detect_track(
        detect, partial(ocsort_step, cfg), ocsort_init(cfg), f, chunk))
    for v in range(V):
        _, dets_1, outs_1 = one(videos[v])
        assert bool(jnp.any(dets_1.valid))
        for f in Detections._fields:
            a = np.asarray(getattr(dets_c, f)[v])
            b = np.asarray(getattr(dets_1, f))
            if f == "ref":
                b = b + v * F * D
            np.testing.assert_array_equal(a, b, err_msg=f"dets {f}")
        for f in outs_1._fields:
            a = np.asarray(getattr(outs_c, f)[v])
            b = np.asarray(getattr(outs_1, f))
            if f == "ref":
                b = np.where(b >= 0, b + v * F * D, b)
            np.testing.assert_array_equal(a, b, err_msg=f"outs {f}")
