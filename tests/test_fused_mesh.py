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
