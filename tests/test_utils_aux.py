"""Aux utils: coordinates, accessors, collate, wandb no-op, notebook
entry, download md5."""
import numpy as np
import pandas as pd
import pytest


class TestCoordinates:
    def test_conversion_roundtrips(self):
        from tracklab_tpu.utils import coordinates as C
        rng = np.random.default_rng(0)
        ltwh = np.concatenate([rng.uniform(0, 500, (10, 2)),
                               rng.uniform(10, 100, (10, 2))], axis=1)
        np.testing.assert_allclose(
            C.ltrb_to_ltwh(C.ltwh_to_ltrb(ltwh)), ltwh, atol=1e-9)
        np.testing.assert_allclose(
            C.xywh_to_ltwh(C.ltwh_to_xywh(ltwh)), ltwh, atol=1e-9)

    def test_clipping(self):
        from tracklab_tpu.utils import coordinates as C
        box = C.sanitize_bbox_ltwh([-10, -10, 50, 50], (100, 100))
        np.testing.assert_allclose(box, [0, 0, 40, 40])

    def test_bbox_from_keypoints(self):
        from tracklab_tpu.utils import coordinates as C
        kp = np.array([[10, 20, 1.0], [50, 120, 1.0], [30, 60, 0.0]])
        ltwh = C.generate_bbox_from_keypoints(kp, (0.1, 0.1, 0.05))
        assert ltwh[0] < 10 and ltwh[1] < 20
        assert ltwh[0] + ltwh[2] > 50 and ltwh[1] + ltwh[3] > 120

    def test_kp_img_to_bbox_coords(self):
        from tracklab_tpu.utils import coordinates as C
        kp = np.array([[15.0, 25.0, 0.9], [100.0, 100.0, 0.9]])
        local = C.kp_img_to_kp_bbox(kp, [10, 20, 20, 20])
        np.testing.assert_allclose(local[0], [5, 5, 0.9])
        assert local[1, 2] == 0.0  # outside the box -> conf zeroed


class TestAccessors:
    def test_bbox_accessor(self):
        import tracklab_tpu.utils  # noqa: F401 registers accessors
        df = pd.DataFrame({
            "bbox_ltwh": [np.array([10.0, 20, 30, 40])],
            "bbox_conf": [0.9],
        })
        np.testing.assert_allclose(df.bbox.ltrb().iloc[0],
                                   [10, 20, 40, 60])
        np.testing.assert_allclose(df.bbox.xywh().iloc[0],
                                   [25, 40, 30, 40])
        row = df.iloc[0]
        np.testing.assert_allclose(row.bbox.ltrb(), [10, 20, 40, 60])


class TestCollate:
    def test_stack_and_unbatchable(self):
        from tracklab_tpu.utils.collate import default_collate, Unbatchable
        batch = [{"a": np.zeros(3), "b": Unbatchable("x"), "c": 1},
                 {"a": np.ones(3), "b": Unbatchable("y"), "c": 2}]
        out = default_collate(batch)
        assert out["a"].shape == (2, 3)
        assert out["b"] == ["x", "y"]
        np.testing.assert_array_equal(out["c"], [1, 2])

    def test_ragged_stays_list(self):
        from tracklab_tpu.utils.collate import default_collate
        out = default_collate([np.zeros(2), np.zeros(3)])
        assert isinstance(out, list)


def test_wandb_noop_without_wandb():
    from tracklab_tpu.utils import wandb as wb
    assert wb.init({"experiment_name": "t"}) is None or True
    wb.log_metrics({"a": 1.0})
    wb.finish()


def test_download_md5(tmp_path):
    from tracklab_tpu.utils.download import md5sum, get_checkpoint
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello")
    assert md5sum(p) == "5d41402abc4b2a76b9719d911017c592"
    assert get_checkpoint(str(p)) == p
    with pytest.raises(FileNotFoundError):
        get_checkpoint("/nonexistent/weights.pt")


def test_notebook_entry():
    from tracklab_tpu.utils.notebook import load_from_overrides
    te = load_from_overrides([
        "dataset=synthetic", "dataset.n_videos=1",
        "dataset.n_frames=5", "use_rich=false"])
    assert te.pipeline is not None
    assert len(te.tracker_state.video_metadatas) == 1


def test_plugin_discovery_graceful():
    from tracklab_tpu.config.plugins import discover_plugin_config_dirs
    assert isinstance(discover_plugin_config_dirs(), list)
