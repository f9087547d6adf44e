"""KPReId wrapper: prompts, embeddings pipeline, tracker consumption,
training smoke — VERDICT r2 item 2 ("an e2e test that BPBReID-StrongSORT
consumes its part embeddings")."""
import numpy as np
import pandas as pd
import pytest

ARCH = dict(crop_size=(64, 32), embed_dim=64, depth=2, num_heads=2,
            dim_reduce_output=32, num_parts=5, batch_size=4)


def _tiny_module(**kw):
    from tracklab_tpu.wrappers.reid import KPReId
    cfg = dict(ARCH)
    cfg.update(kw)
    return KPReId(**cfg)


def test_kpr_embeddings_pipeline():
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (120, 160, 3), np.uint8)
    kp = np.zeros((17, 3), np.float32)
    kp[:, 0] = 20 + rng.uniform(0, 40, 17)
    kp[:, 1] = 15 + rng.uniform(0, 70, 17)
    kp[:, 2] = 1.0
    neg = np.array([[30.0, 30.0, 1.0]], np.float32)
    dets = pd.DataFrame({
        "image_id": [0, 0],
        "bbox_ltwh": [np.array([10, 10, 40, 80], np.float32),
                      np.array([80, 20, 40, 80], np.float32)],
        "keypoints_xyc": [kp, kp],
        "negative_kps": [neg, None],
    }, index=[100, 101])
    module = _tiny_module()
    samples = [module.preprocess(image, dets.loc[i], None)
               for i in dets.index]
    assert samples[0]["crop"].shape == (64, 32, 3)
    assert samples[0]["prompts"].shape == (64, 32, 7)
    # positive groups populated, negative channel only for det 100
    assert samples[0]["prompts"][..., :6].max() > 0.5
    assert samples[0]["prompts"][..., 6].max() > 0.5
    assert samples[1]["prompts"][..., 6].max() == 0.0
    batch = module.collate_fn(samples)
    out = module.process(batch, dets, None)
    assert list(out.columns) == ["embeddings", "visibility_scores"]
    # ['bn_foreg','parts'] with K=5 -> 6 rows (the reference tracker's
    # n_parts=6 default layout)
    assert out.loc[100, "embeddings"].shape == (6, 32)
    assert out.loc[100, "visibility_scores"].shape == (6,)


def test_kpr_feeds_bpbreid_strongsort():
    """Full part-based chain: KPReId embeddings -> BPBReIDStrongSORT
    whole-video scan assigns consistent track ids."""
    from tracklab_tpu.wrappers.reid import KPReId
    from tracklab_tpu.wrappers.track.scan_tracker import BPBReIDStrongSORT

    rng = np.random.default_rng(1)
    module = _tiny_module()
    n_frames, n_obj = 6, 2
    rows = []
    idx = 0
    images = {f: rng.integers(0, 255, (120, 160, 3), np.uint8)
              for f in range(n_frames)}
    pos0 = np.array([[10.0, 10.0], [90.0, 30.0]])
    for f in range(n_frames):
        for o in range(n_obj):
            l, t = pos0[o] + f * np.array([3.0, 1.0])
            rows.append(dict(image_id=f, video_id=0,
                             bbox_ltwh=np.array([l, t, 40, 70],
                                                np.float32),
                             bbox_conf=0.9, category_id=1,
                             name=idx))
            idx += 1
    dets = pd.DataFrame(rows).set_index("name")
    # run reid per frame (detection-level module semantics)
    outs = []
    for f in range(n_frames):
        sub = dets[dets["image_id"] == f]
        samples = [module.preprocess(images[f], sub.loc[i], None)
                   for i in sub.index]
        outs.append(module.process(module.collate_fn(samples), sub, None))
    reid = pd.concat(outs)
    dets = dets.join(reid)
    assert dets["embeddings"].iloc[0].shape == (6, 32)

    metas = pd.DataFrame({"file_path": [f"{f}.jpg"
                                        for f in range(n_frames)]},
                         index=range(n_frames))
    tracker = BPBReIDStrongSORT(n_parts=6, embed_dim=32, max_tracks=8,
                                max_dets=8, n_frame_bucket=8)
    result = tracker.process(dets, metas)
    got = dets.join(result[["track_id"]], how="inner")
    ids_by_frame = {}
    for i, row in got.iterrows():
        ids_by_frame.setdefault(row["image_id"], []).append(
            row["track_id"])
    ids = [sorted(v) for v in ids_by_frame.values()]
    # every frame after tracker warm-up emits both objects with the SAME
    # two ids (StrongSORT emits confirmed tracks from their first update)
    assert len(ids) >= n_frames - 1
    assert all(v == ids[0] for v in ids), ids
    assert len(set(ids[0])) == n_obj


def test_kpr_training_smoke(tmp_path):
    """module.train() runs the Flax loop on GT crops and returns
    updated variables (ref kpreid_api.py:185-186)."""
    import cv2

    from tracklab_tpu.datastruct import TrackingDataset, TrackingSet

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    n_frames = 4
    image_rows, det_rows = [], []
    for f in range(n_frames):
        p = img_dir / f"{f}.jpg"
        cv2.imwrite(str(p), rng.integers(0, 255, (100, 140, 3),
                                         np.uint8))
        image_rows.append(dict(id=f, video_id=0, frame=f,
                               file_path=str(p), is_labeled=True))
        for tid in range(2):
            det_rows.append(dict(
                id=len(det_rows), image_id=f, video_id=0, track_id=tid,
                bbox_ltwh=np.array([10 + 60 * tid, 10, 40, 70],
                                   np.float32), category_id=1))
    video_md = pd.DataFrame([dict(id=0, name="v0", nframes=n_frames)]
                            ).set_index("id")
    image_md = pd.DataFrame(image_rows).set_index("id")
    dets_gt = pd.DataFrame(det_rows).set_index("id")
    ts = TrackingSet(video_md, image_md, dets_gt)
    ds = TrackingDataset("kprtrain", {"train": ts}, nvid=-1)

    module = _tiny_module()
    module._build()
    before = np.asarray(
        module.variables["params"]["pixel_classifier"]["kernel"]).copy()
    metrics = module.train(ds, epochs=1, batch_size=4)
    assert "loss" in metrics and len(metrics["loss"]) == 1
    after = np.asarray(
        module.variables["params"]["pixel_classifier"]["kernel"])
    assert not np.allclose(before, after)
