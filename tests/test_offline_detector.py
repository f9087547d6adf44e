"""Offline engine end-to-end with a detector stage (images on disk ->
image-level detector -> scan tracker -> eval), plus checkpoint IO."""
import numpy as np
import pandas as pd
import pytest


def render_frames(tmp_path, n_frames=12, size=(160, 120)):
    """Two bright squares moving on dark background + TrackingSet."""
    import cv2
    from tracklab_tpu.datastruct.tracking_dataset import TrackingSet
    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    image_rows, gt_rows = [], []
    det_id = 0
    for f in range(n_frames):
        img = np.full((size[1], size[0], 3), 15, np.uint8)
        boxes = [(10 + 6 * f, 20, 24, 30, 200),
                 (120 - 5 * f, 70, 20, 26, 255)]
        for t, (x, y, w, h, val) in enumerate(boxes):
            img[y:y + h, x:x + w] = val
            gt_rows.append(dict(
                id=det_id, image_id=f, video_id=0, frame=f + 1,
                track_id=t + 1,
                bbox_ltwh=np.array([x, y, w, h], np.float32),
                bbox_conf=1.0, category_id=1))
            det_id += 1
        p = img_dir / f"{f:06d}.jpg"
        cv2.imwrite(str(p), img)
        image_rows.append(dict(id=f, video_id=0, frame=f + 1,
                               file_path=str(p), is_labeled=True))
    videos = pd.DataFrame([dict(id=0, name="clip", nframes=n_frames,
                                frame_rate=30)]).set_index("id")
    images = pd.DataFrame(image_rows).set_index("id")
    gt = pd.DataFrame(gt_rows).set_index("id")
    return TrackingSet(videos, images, gt)


def make_threshold_detector():
    from tracklab_tpu.pipeline.levels import ImageLevelModule
    from tracklab_tpu.utils.collate import default_collate, Unbatchable

    class Bright(ImageLevelModule):
        input_columns = []
        output_columns = ["image_id", "video_id", "category_id",
                          "bbox_ltwh", "bbox_conf"]
        collate_fn = staticmethod(default_collate)

        def __init__(self):
            super().__init__(batch_size=4)
            self.id = 0

        def preprocess(self, image, detections, metadata):
            return {"image": Unbatchable(image)}

        def process(self, batch, detections, metadatas):
            import cv2
            rows = []
            for image, (image_id, md) in zip(batch["image"],
                                             metadatas.iterrows()):
                mask = (image[..., 0] > 100).astype(np.uint8)
                n, labels = cv2.connectedComponents(mask)
                for c in range(1, n):
                    ys, xs = np.nonzero(labels == c)
                    l, t = xs.min(), ys.min()
                    rows.append(pd.Series(dict(
                        image_id=image_id, video_id=md["video_id"],
                        category_id=1,
                        bbox_ltwh=np.array(
                            [l, t, xs.max() - l + 1, ys.max() - t + 1],
                            np.float32),
                        bbox_conf=0.95), name=self.id))
                    self.id += 1
            return rows

    return Bright()


def test_offline_detector_pipeline(tmp_path):
    from tracklab_tpu.datastruct.tracker_state import TrackerState
    from tracklab_tpu.engine import OfflineTrackingEngine
    from tracklab_tpu.eval import TrackEvalEvaluator
    from tracklab_tpu.pipeline.module import Pipeline
    from tracklab_tpu.wrappers.track import OCSORT

    ts = render_frames(tmp_path)
    detector = make_threshold_detector()
    tracker = OCSORT(min_hits=1, det_thresh=0.4, max_dets=8,
                     max_tracks=8, iou_threshold=0.1)
    pipeline = Pipeline([detector, tracker])
    state = TrackerState(ts, pipeline)
    engine = OfflineTrackingEngine(tracker_state=state,
                                   modules=[detector, tracker],
                                   callbacks=[])
    engine.track_dataset()
    results = TrackEvalEvaluator(eval_set="val").run(state)
    combined = results["COMBINED_SEQ"]
    assert combined["MOTA"] > 90, combined
    assert combined["IDSW"] == 0
    assert combined["HOTA"] > 80, combined


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.models.yolox import YOLOX
    from tracklab_tpu.models.convert import save_checkpoint, \
        load_checkpoint
    model = YOLOX(num_classes=1, variant="nano")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    path = tmp_path / "ckpt"
    save_checkpoint(path, v)
    restored = load_checkpoint(path, model, (1, 64, 64, 3))
    a = model.apply(v, x, method=YOLOX.predict)
    b = model.apply(restored, x, method=YOLOX.predict)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_detector_finetuning(tmp_path):
    """module.train() parity: fine-tune YOLOX on the dataset GT."""
    from tracklab_tpu.datastruct.tracking_dataset import TrackingDataset
    from tracklab_tpu.wrappers.bbox_detector import YOLOXDetector

    ts = render_frames(tmp_path, n_frames=8)
    ds = TrackingDataset(str(tmp_path), {"train": ts})
    det = YOLOXDetector(variant="nano", num_classes=1,
                        input_size=(128, 128), batch_size=2)
    metrics = det.train(ds, epochs=2, batch_size=4, max_images=8)
    assert "loss" in metrics
    assert np.isfinite(metrics["loss"][-1])
    assert metrics["loss"][-1] < metrics["loss"][0] * 1.5
    # trained weights survive the rebuild
    det._build()
    assert det._infer is not None
