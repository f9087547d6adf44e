"""OSNet / pose model / ReID module tests (tiny shapes, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
import pytest


class TestOSNet:
    def test_forward_shapes(self):
        from tracklab_tpu.models.osnet import OSNet
        m = OSNet(variant="x0_25", feat_dim=64, n_parts=4)
        x = jnp.zeros((2, 64, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out["embeddings"].shape == (2, 64)
        assert out["part_features"].shape == (2, 5, 64)
        assert out["visibility"].shape == (2, 5)
        vis = np.asarray(out["visibility"])
        assert (vis >= 0).all() and (vis <= 1 + 1e-6).all()


class TestPoseDecode:
    def test_heatmap_peak_decode(self):
        from tracklab_tpu.models.pose import decode_heatmaps
        hm = np.zeros((1, 16, 12, 2), np.float32)
        hm[0, 5, 7, 0] = 1.0
        hm[0, 5, 8, 0] = 0.5   # refinement pulls +x
        hm[0, 10, 3, 1] = 0.8
        kp = np.asarray(decode_heatmaps(jnp.asarray(hm)))
        assert kp.shape == (1, 2, 3)
        np.testing.assert_allclose(kp[0, 0, :2], [7.25, 5.0], atol=0.3)
        np.testing.assert_allclose(kp[0, 1, :2], [3.0, 10.0], atol=0.3)
        assert kp[0, 0, 2] == 1.0

    def test_topdown_predict_shape(self):
        from tracklab_tpu.models.pose import TopDownPose
        m = TopDownPose(num_keypoints=5, variant="nano")
        x = jnp.zeros((2, 64, 48, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        kp = m.predict_keypoints(v, x)
        assert kp.shape == (2, 5, 3)

    def test_yoloxpose_predict_shape(self):
        from tracklab_tpu.models.pose import YOLOXPose
        m = YOLOXPose(num_classes=1, num_keypoints=5, variant="nano")
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        decoded, kps = m.predict(v, x)
        A = 8 * 8 + 4 * 4 + 2 * 2
        assert decoded.shape == (1, A, 6)
        assert kps.shape == (1, A, 5, 3)


class TestReIdModule:
    def test_embeddings_pipeline(self, tmp_path):
        import cv2
        from tracklab_tpu.wrappers.reid import OSNetReId
        img_dir = tmp_path / "f"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (120, 160, 3), np.uint8)
        cv2.imwrite(str(img_dir / "0.jpg"), img)
        dets = pd.DataFrame({
            "image_id": [0, 0],
            "bbox_ltwh": [np.array([10, 10, 40, 80], np.float32),
                          np.array([80, 20, 40, 80], np.float32)],
        }, index=[100, 101])
        module = OSNetReId(variant="x0_25", feat_dim=32, n_parts=4,
                           crop_size=(64, 32), batch_size=2)
        image = cv2.cvtColor(cv2.imread(str(img_dir / "0.jpg")),
                             cv2.COLOR_BGR2RGB)
        samples = [module.preprocess(image, dets.loc[i], None)
                   for i in dets.index]
        batch = module.collate_fn(samples)
        out = module.process(batch, dets, None)
        assert list(out.columns) == ["embeddings", "visibility_scores"]
        assert out.loc[100, "embeddings"].shape == (5, 32)
        assert out.loc[100, "visibility_scores"].shape == (5,)

    def test_keypoint_prompts(self, tmp_path):
        import cv2
        from tracklab_tpu.wrappers.reid import OSNetReId
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, (120, 160, 3), np.uint8)
        kp = np.zeros((17, 3), np.float32)
        kp[:, 0] = 20 + rng.uniform(0, 40, 17)
        kp[:, 1] = 15 + rng.uniform(0, 70, 17)
        kp[:, 2] = 1.0
        kp[13:, 2] = 0.0  # legs/feet invisible
        det = pd.Series({
            "bbox_ltwh": np.array([15, 10, 50, 80], np.float32),
            "keypoints_xyc": kp,
        }, name=7)
        module = OSNetReId(variant="x0_25", feat_dim=32, n_parts=6,
                           crop_size=(64, 32), batch_size=1,
                           use_keypoints=True)
        sample = module.preprocess(image, det, None)
        assert sample["crop"].shape == (64, 32, 3 + 5)
        batch = module.collate_fn([sample])
        out = module.process(batch, pd.DataFrame(index=[7]), None)
        vis = out.loc[7, "visibility_scores"]
        assert vis[0] == 1.0          # global part
        assert vis[1] > 0.9           # head visible
        assert vis[4] == 0.0 and vis[5] == 0.0   # legs/feet invisible

    def test_reid_training_smoke(self, tmp_path):
        import cv2
        from tracklab_tpu.wrappers.reid import OSNetReId
        from tracklab_tpu.wrappers.dataset.synthetic import (
            SyntheticDataset,
        )
        # render the synthetic frames to disk so crops exist
        ds = SyntheticDataset(n_videos=1, n_frames=6, n_objects=3)
        ts = ds.sets["train"]
        rng = np.random.default_rng(0)
        paths = {}
        for image_id, meta in ts.image_metadatas.iterrows():
            img = rng.integers(0, 255, (1080, 1920, 3), np.uint8)
            p = tmp_path / f"{image_id}.jpg"
            cv2.imwrite(str(p), img)
            paths[image_id] = str(p)
        ts.image_metadatas["file_path"] = [
            paths[i] for i in ts.image_metadatas.index]
        module = OSNetReId(variant="x0_25", feat_dim=32, n_parts=4,
                           crop_size=(64, 32), batch_size=8)
        metrics = module.train(ds, None, None, None, epochs=1,
                               batch_size=8)
        assert "loss" in metrics and np.isfinite(metrics["loss"][-1])


class TestBatchedReId:
    def test_device_crops_pipeline(self, tmp_path):
        import cv2
        from tracklab_tpu.wrappers.reid import OSNetReIdBatched
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, (240, 320, 3), np.uint8)
        dets = pd.DataFrame({
            "image_id": [0, 0, 0],
            "bbox_ltwh": [np.array([10, 10, 40, 80], np.float32),
                          np.array([100, 30, 50, 90], np.float32),
                          np.array([200, 50, 40, 100], np.float32)],
        }, index=[7, 8, 9])
        module = OSNetReIdBatched(
            variant="x0_25", feat_dim=32, n_parts=4,
            crop_size=(64, 32), work_size=(128, 160), max_dets=4,
            batch_size=1)
        sample = module.preprocess(image, dets, pd.Series({"video_id": 0}))
        assert sample["image"].shape == (128, 160, 3)
        batch = module.collate_fn([sample])
        out = module.process(batch, dets, None)
        assert sorted(out.index) == [7, 8, 9]
        assert out.loc[7, "embeddings"].shape == (5, 32)
        # different crops -> different embeddings
        a = out.loc[7, "embeddings"].ravel()
        b = out.loc[8, "embeddings"].ravel()
        assert np.abs(a - b).max() > 1e-4


class TestViTPose:
    def test_forward_and_decode(self):
        from tracklab_tpu.models.vitpose import ViTPose
        m = ViTPose(num_keypoints=4, variant="tiny")
        x = jnp.zeros((2, 64, 48, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        hm = m.apply(v, x, train=False)
        assert hm.shape == (2, 16, 12, 4)
        kp = m.predict_keypoints(v, x)
        assert kp.shape == (2, 4, 3)

    def test_wrapper_vit_backend(self):
        from tracklab_tpu.wrappers.pose_estimator import (
            TopDownPoseEstimator,
        )
        mod = TopDownPoseEstimator(backbone="vit", variant="tiny",
                                   num_keypoints=4, crop_size=(64, 48),
                                   batch_size=2)
        mod._build()
        import jax.numpy as jnp2
        kp = np.asarray(mod._infer(np.zeros((2, 64, 48, 3), np.uint8)))
        assert kp.shape == (2, 4, 3)


class TestReidBackboneZoo:
    @pytest.mark.parametrize("backbone,dim", [("resnet18", 512),
                                              ("mobilenetv2_x1_0", 1280)])
    def test_zoo_backbone_pipeline(self, tmp_path, backbone, dim):
        import cv2
        from tracklab_tpu.wrappers.reid import OSNetReId
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (120, 160, 3), np.uint8)
        dets = pd.DataFrame({
            "image_id": [0],
            "bbox_ltwh": [np.array([10, 10, 40, 80], np.float32)],
        }, index=[100])
        module = OSNetReId(backbone=backbone, crop_size=(64, 32),
                           batch_size=1)
        samples = [module.preprocess(img, dets.loc[100], None)]
        out = module.process(module.collate_fn(samples), dets, None)
        emb = out.loc[100, "embeddings"]
        assert emb.shape == (dim,)
        assert np.isfinite(emb).all()


def test_zoo_osnet_ain_pipeline():
    from tracklab_tpu.wrappers.reid import OSNetReId
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160, 3), np.uint8)
    dets = pd.DataFrame({
        "image_id": [0],
        "bbox_ltwh": [np.array([10, 10, 40, 80], np.float32)],
    }, index=[100])
    module = OSNetReId(backbone="osnet_ain_x0_25", feat_dim=64,
                       crop_size=(64, 32), batch_size=1)
    samples = [module.preprocess(img, dets.loc[100], None)]
    out = module.process(module.collate_fn(samples), dets, None)
    emb = out.loc[100, "embeddings"]
    assert emb.shape == (64,) and np.isfinite(emb).all()


class TestSimCC:
    def test_decode_semantics(self):
        """mmpose get_simcc_maximum golden behaviors: argmax/ratio
        locations, min-axis score, invalidation at score <= 0."""
        import jax.numpy as jnp
        from tracklab_tpu.models.pose import decode_simcc

        B, K, W2, H2 = 1, 3, 20, 16
        sx = np.zeros((B, K, W2), np.float32)
        sy = np.zeros((B, K, H2), np.float32)
        # kp0: clean peak at x-bin 7, y-bin 4, scores .8/.6 -> min .6
        sx[0, 0, 7] = 0.8
        sy[0, 0, 4] = 0.6
        # kp1: negative peaks -> invalid
        sx[0, 1] = -1.0
        sy[0, 1] = -1.0
        # kp2: peak at bin 0 with positive score
        sx[0, 2, 0] = 0.5
        sy[0, 2, 15] = 0.9
        out = np.asarray(decode_simcc(jnp.asarray(sx), jnp.asarray(sy),
                                      split_ratio=2.0))
        np.testing.assert_allclose(out[0, 0], [3.5, 2.0, 0.6])
        assert out[0, 1, 0] == -1.0 and out[0, 1, 1] == -1.0
        np.testing.assert_allclose(out[0, 2], [0.0, 7.5, 0.5])

    def test_simcc_model_shapes_and_train_signal(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.pose import SimCCPose

        model = SimCCPose(num_keypoints=5, variant="nano",
                          input_size=(64, 48))
        x = jnp.zeros((2, 64, 48, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        sx, sy = model.apply(variables, x, train=False)
        assert sx.shape == (2, 5, 96)
        assert sy.shape == (2, 5, 128)
        kp = model.predict_keypoints(variables, x)
        assert kp.shape == (2, 5, 3)
        assert np.all(np.asarray(kp[..., 0]) < 48)
        assert np.all(np.asarray(kp[..., 1]) < 64)


def test_topdown_simcc_backbone_pipeline():
    from tracklab_tpu.wrappers.pose_estimator import TopDownPoseEstimator
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    det = pd.Series({"bbox_ltwh": np.array([40, 40, 80, 160],
                                           np.float32)})
    mod = TopDownPoseEstimator(variant="nano", backbone="simcc",
                               num_keypoints=5, crop_size=(64, 48),
                               batch_size=1)
    sample = mod.preprocess(img, det, None)
    batch = mod.collate_fn([sample])
    dets = pd.DataFrame([det], index=[0])
    out = mod.process(batch, dets, None)
    kp = out.loc[0, "keypoints_xyc"]
    assert kp.shape == (5, 3)
    assert np.isfinite(kp).all()


def test_yolo11_pose_decode_geometry_and_wrapper():
    """decode_v11_kpts: xy = (raw*2 + cell_center - 0.5) * stride,
    sigmoid conf; wrapper smoke with variant='11n'."""
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.models.yolo11 import decode_v11_kpts

    kmap = np.zeros((1, 2, 2, 3), np.float32)   # 1 level, K=1
    kmap[0, 1, 1] = [0.25, -0.25, 0.0]          # cell (1,1)
    out = np.asarray(decode_v11_kpts([jnp.asarray(kmap)], 1,
                                     strides=(8,)))
    # anchor center (1.5, 1.5): x = (0.5 + 1.5 - 0.5)*8 = 12;
    # y = (-0.5 + 1.5 - 0.5)*8 = 4; conf = sigmoid(0) = 0.5
    np.testing.assert_allclose(out[0, 3, 0], [12.0, 4.0, 0.5])

    from tracklab_tpu.wrappers.pose_estimator import (
        BottomUpPoseEstimator,
    )
    mod = BottomUpPoseEstimator(variant="11n", num_keypoints=5,
                                input_size=(128, 128),
                                min_confidence=0.0, max_dets=8,
                                batch_size=1)
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3),
                                            np.uint8)
    meta = pd.DataFrame([dict(video_id=0)], index=[3])
    import tracklab_tpu.utils.collate as Co
    batch = Co.default_collate(
        [mod.preprocess(img, None, meta.iloc[0])])
    rows = mod.process(batch, None, meta)
    assert isinstance(rows, list)
    if rows:
        assert rows[0].keypoints_xyc.shape == (5, 3)


def test_all_zoo_backbone_names_resolve():
    """Every documented backbone= string resolves to the right model
    class (or raises the documented crop/unknown-name errors) — guards
    the wrapper's selection against drift from the model zoo."""
    import pytest
    from tracklab_tpu.wrappers.reid.osnet_api import (
        select_backbone_model,
    )

    expected = {
        "osnet": "OSNet", "osnet_ain_x1_0": "OSNetAIN",
        "osnet_ain_x0_25": "OSNetAIN",
        "resnet18": "ReidResNet", "resnet34": "ReidResNet",
        "resnet50": "ReidResNet", "resnet101": "ReidResNet",
        "resnet152": "ReidResNet", "resnet50_fc512": "ReidResNet",
        "resnext50_32x4d": "ReidResNet",
        "resnext101_32x8d": "ReidResNet",
        "resnet50_ibn_a": "ReidResNetIBN",
        "resnet50_ibn_b": "ReidResNetIBNb",
        "resnet50mid": "ReidResNetMid",
        "se_resnet50": "ReidSEResNet",
        "mobilenetv2_x1_0": "ReidMobileNetV2",
        "mobilenetv2_x1_4": "ReidMobileNetV2",
        "shufflenet_v2_x0_5": "ReidShuffleNetV2",
        "shufflenet_v2_x2_0": "ReidShuffleNetV2",
        "densenet121": "ReidDenseNet",
        "squeezenet1_0": "ReidSqueezeNet",
        "mlfn": "ReidMLFN", "pcb_p6": "ReidPCB", "pcb_p4": "ReidPCB",
        "xception": "ReidXception",
        "inceptionv4": "ReidInceptionV4",
        "inceptionresnetv2": "ReidInceptionResNetV2",
        "nasnetamobile": "ReidNASNetAMobile",
        "mudeep": "ReidMuDeep", "hacnn": "ReidHACNN",
    }
    crops = {"hacnn": (160, 64), "mudeep": (256, 128)}
    for name, cls in expected.items():
        model = select_backbone_model(
            name, crop_size=crops.get(name, (256, 128)))
        assert type(model).__name__ == cls, name
    with pytest.raises(ValueError, match="Unknown reid backbone"):
        select_backbone_model("definitely_not_a_backbone")
    with pytest.raises(ValueError, match="160, 64"):
        select_backbone_model("hacnn", crop_size=(64, 32))
    with pytest.raises(ValueError, match="256, 128"):
        select_backbone_model("mudeep", crop_size=(64, 32))
