"""Multi-chip fused e2e: V videos sharded over the virtual mesh ==
running the single-video fused program per video.

The production multi-chip shape (parallel/fused_mesh.py): one complete
detector -> NMS -> tracker program per device, one video each, no
collectives. Verified on the 8-device virtual CPU mesh against the
already-equivalence-tested single-video path (test_fused_pipeline.py).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracklab_tpu.engine.fused import (fused_detect_track,
                                       make_yolox_detect_fn)
from tracklab_tpu.parallel.fused_mesh import fused_videos_sharded
from tracklab_tpu.parallel.mesh import make_mesh
from tracklab_tpu.trackers.ocsort import (OCSortConfig, ocsort_init,
                                          ocsort_step)


@pytest.fixture(scope="module")
def tiny():
    from tracklab_tpu.models.yolox import YOLOX
    model = YOLOX(num_classes=1, variant="nano")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3), jnp.float32),
                           train=False)
    detect = make_yolox_detect_fn(model, variables, conf_threshold=0.3,
                                  max_dets=16)
    cfg = OCSortConfig(max_tracks=32, max_dets=16, min_hits=1,
                       det_thresh=0.1)
    return detect, cfg


def _videos(v, f, h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(8, 247, (v, 1, h, w, 3))
    jitter = rng.integers(-4, 5, (v, f, h, w, 3))
    return jnp.asarray(np.clip(base + jitter, 0, 255), jnp.uint8)


@pytest.mark.parametrize("vid_axis", ["dp", "video"])
def test_sharded_equals_per_video(tiny, vid_axis):
    detect, cfg = tiny
    if vid_axis == "dp":
        mesh = make_mesh(8, axis_names=("dp", "tp"), tp_size=1)
        videos_per_shard = 1
    else:  # fewer shards than videos: lax.map iterates within a shard
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:4]), ("video",))
        videos_per_shard = 2
    V, F, chunk = 8, 8, 4
    frames = _videos(V, F)
    # ragged tails: last video has 2 padded frames
    frame_valid = np.ones((V, F), bool)
    frame_valid[-1, -2:] = False
    frame_valid = jnp.asarray(frame_valid)

    run = fused_videos_sharded(detect, partial(ocsort_step, cfg),
                               ocsort_init(cfg), mesh, chunk,
                               axis=vid_axis, return_detections=True)
    finals, dets, outs = run(frames, frame_valid)
    assert dets.valid.shape[:2] == (V, F)
    assert mesh.shape[vid_axis] * videos_per_shard == V

    single = jax.jit(lambda f, fv: fused_detect_track(
        detect, partial(ocsort_step, cfg), ocsort_init(cfg), f, chunk,
        frame_valid=fv, return_detections=True))
    any_tracks = False
    for v in range(V):
        _, d1, o1 = single(frames[v], frame_valid[v])
        np.testing.assert_array_equal(np.asarray(dets.valid[v]),
                                      np.asarray(d1.valid))
        np.testing.assert_allclose(np.asarray(dets.ltrb[v]),
                                   np.asarray(d1.ltrb),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(outs.valid[v]),
                                      np.asarray(o1.valid))
        np.testing.assert_array_equal(np.asarray(outs.track_id[v]),
                                      np.asarray(o1.track_id))
        np.testing.assert_allclose(np.asarray(outs.ltrb[v]),
                                   np.asarray(o1.ltrb),
                                   rtol=1e-5, atol=1e-4)
        any_tracks = any_tracks or bool(np.asarray(o1.valid).any())
    assert any_tracks, "no tracker output anywhere — vacuous test"
    # padded tail frames produced no detections
    assert not bool(np.asarray(dets.valid[-1, -2:]).any())


def test_v_not_multiple_raises(tiny):
    detect, cfg = tiny
    mesh = make_mesh(8, axis_names=("dp", "tp"), tp_size=1)
    run = fused_videos_sharded(detect, partial(ocsort_step, cfg),
                               ocsort_init(cfg), mesh, chunk=4)
    with pytest.raises(ValueError, match="multiple of"):
        run(_videos(3, 4))


def test_reid_sharded_equals_per_video(tiny):
    """The fused detect->ReID->StrongSORT program sharded one video per
    device == the single-video fused program (VERDICT r3 item 7: the
    embedding pipelines get the same multi-chip story as detect->track)."""
    from tracklab_tpu.engine.fused import (fused_detect_reid_track,
                                           make_osnet_embed_fn)
    from tracklab_tpu.models.osnet import OSNet
    from tracklab_tpu.parallel.fused_mesh import fused_reid_videos_sharded
    from tracklab_tpu.trackers.strongsort import (
        StrongSortConfig, strongsort_init, strongsort_step)

    detect, _ = tiny
    osnet = OSNet(variant="x0_25", feat_dim=128, n_parts=2)
    ovars = osnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 32, 3)),
                       train=False)
    embed = make_osnet_embed_fn(osnet, ovars, crop_size=(64, 32))
    scfg = StrongSortConfig(max_tracks=32, max_dets=16, n_init=1,
                            embed_dim=128)
    mesh = make_mesh(8, axis_names=("dp", "tp"), tp_size=1)
    V, F, chunk = 8, 8, 4
    frames = _videos(V, F, seed=3)
    frame_valid = np.ones((V, F), bool)
    frame_valid[-1, -2:] = False
    frame_valid = jnp.asarray(frame_valid)

    run = fused_reid_videos_sharded(
        detect, embed, partial(strongsort_step, scfg),
        strongsort_init(scfg), mesh, chunk, min_confidence=0.2,
        embed_dim=128, return_embeddings=True)
    finals, _, emb, outs = run(frames, frame_valid)
    assert emb["embeddings"].shape[:2] == (V, F)

    single = jax.jit(lambda f, fv: fused_detect_reid_track(
        detect, embed, partial(strongsort_step, scfg),
        strongsort_init(scfg), f, chunk, frame_valid=fv,
        min_confidence=0.2, embed_dim=128, return_embeddings=True))
    any_tracks = False
    for v in range(V):
        _, _, e1, o1 = single(frames[v], frame_valid[v])
        np.testing.assert_allclose(
            np.asarray(emb["embeddings"][v]),
            np.asarray(e1["embeddings"]), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(outs.valid[v]),
                                      np.asarray(o1.valid))
        np.testing.assert_array_equal(np.asarray(outs.track_id[v]),
                                      np.asarray(o1.track_id))
        np.testing.assert_allclose(np.asarray(outs.ltrb[v]),
                                   np.asarray(o1.ltrb),
                                   rtol=1e-5, atol=1e-4)
        any_tracks = any_tracks or bool(np.asarray(o1.valid).any())
    assert any_tracks, "no tracker output anywhere — vacuous test"


def test_pose_sharded_equals_per_video(tiny):
    """The fused detect->pose->track program sharded one video per device
    == the single-video fused program (multi-chip story for BASELINE
    config 3's pose-tracking shape)."""
    from tracklab_tpu.engine.fused import (fused_detect_pose_track,
                                           make_topdown_pose_fn)
    from tracklab_tpu.models.pose import TopDownPose
    from tracklab_tpu.parallel.fused_mesh import fused_pose_videos_sharded

    detect, cfg = tiny
    K = 5
    pmodel = TopDownPose(num_keypoints=K, variant="nano")
    pvars = pmodel.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 64, 48, 3)), train=False)
    pose_fn = make_topdown_pose_fn(pmodel, pvars, crop_size=(64, 48),
                                   num_keypoints=K)
    mesh = make_mesh(8, axis_names=("dp", "tp"), tp_size=1)
    V, F, chunk = 8, 8, 4
    frames = _videos(V, F, seed=5)
    frame_valid = np.ones((V, F), bool)
    frame_valid[-1, -2:] = False
    frame_valid = jnp.asarray(frame_valid)

    run = fused_pose_videos_sharded(
        detect, pose_fn, partial(ocsort_step, cfg), ocsort_init(cfg),
        mesh, chunk, min_confidence=0.2, pose_buckets=(4, 8, 16))
    finals, _, kp, outs = run(frames, frame_valid)
    assert kp.shape[:2] == (V, F)

    single = jax.jit(lambda f, fv: fused_detect_pose_track(
        detect, pose_fn, partial(ocsort_step, cfg), ocsort_init(cfg),
        f, chunk, frame_valid=fv, min_confidence=0.2,
        pose_buckets=(4, 8, 16)))
    any_tracks = False
    for v in range(V):
        _, _, k1, o1 = single(frames[v], frame_valid[v])
        np.testing.assert_allclose(np.asarray(kp[v]), np.asarray(k1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(outs.valid[v]),
                                      np.asarray(o1.valid))
        np.testing.assert_array_equal(np.asarray(outs.track_id[v]),
                                      np.asarray(o1.track_id))
        any_tracks = any_tracks or bool(np.asarray(o1.valid).any())
    assert any_tracks, "no tracker output anywhere — vacuous test"


def test_parts_sharded_equals_per_video(tiny):
    """The FULL fused game-state prefix (detect -> pose -> prompted KPR
    -> OKS-BPBReID, with live-prefix embed_buckets) sharded one video
    per device == the single-video fused program — the reference's
    flagship pipeline shape gets the same multi-chip story as
    detect->track."""
    from tracklab_tpu.engine.fused import (fused_detect_parts_track,
                                           make_kpr_embed_fn,
                                           make_topdown_pose_fn)
    from tracklab_tpu.models.kpr import KPR
    from tracklab_tpu.models.pose import TopDownPose
    from tracklab_tpu.parallel.fused_mesh import (
        fused_parts_videos_sharded)
    from tracklab_tpu.trackers.bpbreid_strongsort import (
        BPBReIDStrongSortConfig, bpbreid_init, bpbreid_step)

    detect, _ = tiny
    K = 5
    kpr = KPR(num_parts=2, dim_reduce_output=16, img_size=(32, 16),
              patch_size=8, stride=8, embed_dim=32, depth=1, num_heads=2)
    kvars = kpr.init(jax.random.PRNGKey(3),
                     jnp.zeros((1, 32, 16, 3)),
                     jnp.zeros((1, 32, 16, kpr.n_prompt_ch)), train=False)
    embed = make_kpr_embed_fn(kpr, kvars, crop_size=(32, 16),
                              n_prompt_ch=kpr.n_prompt_ch)
    pmodel = TopDownPose(num_keypoints=K, variant="nano")
    pvars = pmodel.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 64, 48, 3)), train=False)
    pose_fn = make_topdown_pose_fn(pmodel, pvars, crop_size=(64, 48),
                                   num_keypoints=K)
    # iou association, not oks: random-weight pose keypoints give
    # OKS ~ 0 similarity, which gates EVERY match and leaves the
    # tracker output vacuously empty (probed). The pose -> prompted-KPR
    # prefix is exercised either way.
    cfg = BPBReIDStrongSortConfig(
        motion_criterium="iou", n_parts=3, embed_dim=16, n_keypoints=K,
        max_tracks=16, max_dets=16, n_init=1, max_dist=0.8)
    mesh = make_mesh(8, axis_names=("dp", "tp"), tp_size=1)
    V, F, chunk = 8, 8, 4
    frames = _videos(V, F, seed=7)
    frame_valid = np.ones((V, F), bool)
    frame_valid[-1, -2:] = False
    frame_valid = jnp.asarray(frame_valid)

    kwargs = dict(min_confidence=0.2, n_parts=3, embed_dim=16,
                  n_keypoints=K, pose_fn=pose_fn,
                  embed_buckets=(4, 8, 16), return_embeddings=True)
    run = fused_parts_videos_sharded(
        detect, embed, partial(bpbreid_step, cfg), bpbreid_init(cfg),
        mesh, chunk, **kwargs)
    finals, _, reid, kp, outs = run(frames, frame_valid)
    assert reid["embeddings"].shape[:2] == (V, F)

    single = jax.jit(lambda f, fv: fused_detect_parts_track(
        detect, embed, partial(bpbreid_step, cfg), bpbreid_init(cfg),
        f, chunk, frame_valid=fv, **kwargs))
    any_tracks = False
    for v in range(V):
        _, _, r1, k1, o1 = single(frames[v], frame_valid[v])
        np.testing.assert_allclose(np.asarray(reid["embeddings"][v]),
                                   np.asarray(r1["embeddings"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(kp[v]), np.asarray(k1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(outs.valid[v]),
                                      np.asarray(o1.valid))
        np.testing.assert_array_equal(np.asarray(outs.track_id[v]),
                                      np.asarray(o1.track_id))
        any_tracks = any_tracks or bool(np.asarray(o1.valid).any())
    assert any_tracks, "no tracker output anywhere — vacuous test"


def test_bottomup_sharded_equals_per_video():
    """The fused bottom-up pose program (boxes from keypoints -> tracker)
    sharded one video per device == the single-video fused program."""
    from tracklab_tpu.engine.fused import (fused_bottomup_track,
                                           make_bottomup_detect_fn)
    from tracklab_tpu.models.pose import YOLOXPose
    from tracklab_tpu.parallel.fused_mesh import (
        fused_bottomup_videos_sharded)

    K = 5
    bmodel = YOLOXPose(num_classes=1, num_keypoints=K, variant="nano")
    bvars = bmodel.init(jax.random.PRNGKey(5),
                        jnp.zeros((1, 128, 128, 3)), train=False)
    bdetect = make_bottomup_detect_fn(
        lambda imgs: bmodel.predict(bvars, imgs),
        conf_threshold=0.3, iou_threshold=0.65, max_dets=16)
    cfg = OCSortConfig(max_tracks=32, max_dets=16, min_hits=1,
                       det_thresh=0.1)
    mesh = make_mesh(8, axis_names=("dp", "tp"), tp_size=1)
    V, F, chunk = 8, 8, 4
    frames = _videos(V, F, seed=9)
    frame_valid = np.ones((V, F), bool)
    frame_valid[-1, -2:] = False
    frame_valid = jnp.asarray(frame_valid)

    run = fused_bottomup_videos_sharded(
        bdetect, partial(ocsort_step, cfg), ocsort_init(cfg), mesh,
        chunk, return_detections=True)
    finals, dets, kp, outs = run(frames, frame_valid)
    assert kp.shape[:2] == (V, F)

    single = jax.jit(lambda f, fv: fused_bottomup_track(
        bdetect, partial(ocsort_step, cfg), ocsort_init(cfg), f, chunk,
        frame_valid=fv, return_detections=True))
    any_tracks = False
    for v in range(V):
        _, d1, k1, o1 = single(frames[v], frame_valid[v])
        np.testing.assert_array_equal(np.asarray(dets.valid[v]),
                                      np.asarray(d1.valid))
        np.testing.assert_allclose(np.asarray(kp[v]), np.asarray(k1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(outs.valid[v]),
                                      np.asarray(o1.valid))
        np.testing.assert_array_equal(np.asarray(outs.track_id[v]),
                                      np.asarray(o1.track_id))
        any_tracks = any_tracks or bool(np.asarray(o1.valid).any())
    assert any_tracks, "no tracker output anywhere — vacuous test"
