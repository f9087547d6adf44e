"""Detector / NMS / preprocessing / parallel-layer tests (CPU, tiny)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestYOLOX:
    def test_forward_shapes(self):
        from tracklab_tpu.models.yolox import YOLOX
        model = YOLOX(num_classes=3, variant="nano")
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        outs = model.apply(vars_, x, train=False)
        assert len(outs) == 3
        assert outs[0].shape == (1, 8, 8, 4 + 1 + 3)   # /8
        assert outs[1].shape == (1, 4, 4, 8)           # /16
        assert outs[2].shape == (1, 2, 2, 8)           # /32
        dec = model.apply(vars_, x, method="predict")
        assert dec.shape == (1, 8 * 8 + 4 * 4 + 2 * 2, 8)
        # scores sigmoided into (0, 1)
        assert float(jnp.min(dec[..., 4:])) >= 0.0
        assert float(jnp.max(dec[..., 4:])) <= 1.0

    def test_train_step_decreases_loss(self):
        import optax
        from tracklab_tpu.models.yolox import YOLOX
        from tracklab_tpu.models.train import (
            create_train_state, make_train_step,
        )
        model = YOLOX(num_classes=1, variant="nano")
        tx = optax.adam(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3), tx)
        rng = np.random.default_rng(0)
        boxes = np.zeros((2, 3, 5), np.float32)
        boxes[..., 0:2] = rng.uniform(16, 48, (2, 3, 2))
        boxes[..., 2:4] = rng.uniform(10, 20, (2, 3, 2))
        batch = {
            "images": np.asarray(
                rng.uniform(0, 1, (2, 64, 64, 3)), np.float32),
            "gt_boxes": boxes,
            "gt_valid": np.ones((2, 3), bool),
        }
        step = jax.jit(make_train_step(model, tx, (64, 64)))
        state, loss0 = step(state, batch)
        # overfit the fixed batch long enough that the assertion is not
        # sensitive to the init seed (10 steps can plateau transiently)
        for _ in range(40):
            state, loss = step(state, batch)
        assert float(loss) < float(loss0)
        assert np.isfinite(float(loss))


class TestNMS:
    def test_suppresses_overlaps(self):
        from tracklab_tpu.ops.nms import nms
        boxes = jnp.array([
            [0, 0, 10, 10],
            [1, 1, 11, 11],     # heavy overlap with first
            [50, 50, 60, 60],
        ], jnp.float32)
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = np.asarray(nms(boxes, scores, 0.5))
        assert list(keep) == [True, False, True]

    def test_zero_score_excluded(self):
        from tracklab_tpu.ops.nms import nms
        boxes = jnp.array([[0, 0, 10, 10]], jnp.float32)
        keep = np.asarray(nms(boxes, jnp.array([0.0]), 0.5))
        assert not keep[0]

    def test_per_class_separation(self):
        from tracklab_tpu.ops.nms import batched_nms
        boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        # different classes: both kept
        keep = np.asarray(batched_nms(boxes, scores,
                                      jnp.array([0, 1]), 0.5))
        assert list(keep) == [True, True]
        # same class: one suppressed
        keep = np.asarray(batched_nms(boxes, scores,
                                      jnp.array([0, 0]), 0.5))
        assert list(keep) == [True, False]

    def test_postprocess_shapes(self):
        from tracklab_tpu.ops.nms import postprocess_detections
        rng = np.random.default_rng(0)
        decoded = np.zeros((2, 100, 7), np.float32)
        decoded[..., 0:2] = rng.uniform(50, 500, (2, 100, 2))
        decoded[..., 2:4] = rng.uniform(10, 50, (2, 100, 2))
        decoded[..., 4] = rng.uniform(0, 1, (2, 100))
        decoded[..., 5:] = rng.uniform(0, 1, (2, 100, 2))
        out = postprocess_detections(jnp.asarray(decoded),
                                     conf_threshold=0.3, max_out=16)
        assert out["ltrb"].shape == (2, 16, 4)
        assert out["valid"].shape == (2, 16)
        # valid rows are compacted to the front
        v = np.asarray(out["valid"])
        for b in range(2):
            nz = np.nonzero(v[b])[0]
            assert (nz == np.arange(len(nz))).all()


class TestPreprocess:
    def test_letterbox_geometry(self):
        from tracklab_tpu.models.preprocess import letterbox
        img = jnp.ones((100, 200, 3), jnp.uint8) * 255
        out, (scale, pad_top, pad_left) = letterbox(img, 64, 64)
        assert out.shape == (64, 64, 3)
        assert abs(float(scale) - 0.32) < 1e-6
        # top/bottom padded with 114
        assert float(out[0, 0, 0]) == 114.0
        assert float(out[32, 32, 0]) == 255.0

    def test_crop_resize_identity(self):
        from tracklab_tpu.models.preprocess import crop_resize
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
        boxes = jnp.array([[0, 0, 32, 32]], jnp.float32)
        out = crop_resize(img, boxes, 32, 32)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img),
                                   atol=1e-5)

    def test_crop_resize_onehot_matches_gather(self):
        """The one-hot MXU crop (the TPU backend of crop_resize_auto)
        reproduces the 4-tap gather, including the border-clamp
        semantics for boxes hanging off the frame."""
        from tracklab_tpu.models.preprocess import (
            crop_resize, crop_resize_onehot,
        )
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 255, (48, 64, 3)), jnp.float32)
        boxes = jnp.asarray([
            [3.2, 5.7, 40.9, 44.1],       # interior, fractional
            [-10.0, -8.0, 20.0, 30.0],    # off the top-left
            [30.0, 20.0, 90.0, 70.0],     # off the bottom-right
            [10.0, 10.0, 10.5, 10.5],     # sub-pixel box
        ], jnp.float32)
        want = np.asarray(crop_resize(img, boxes, 24, 16))
        got = np.asarray(crop_resize_onehot(img, boxes, 24, 16,
                                            dtype=jnp.float32))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)
        # bf16 operands: within input-quantization noise of the 0..255
        # pixel range (the downstream models are bf16 anyway)
        got16 = np.asarray(crop_resize_onehot(img, boxes, 24, 16))
        assert np.abs(got16 - want).max() < 2.5


class TestParallel:
    def test_mesh_and_sharded_tracking(self):
        from tracklab_tpu.parallel.mesh import (
            make_mesh, tracker_videos_sharded,
        )
        from tracklab_tpu.trackers.ocsort import OCSortConfig, ocsort_scan
        from tracklab_tpu.trackers.common import Detections
        assert len(jax.devices()) == 8
        mesh = make_mesh(8, axis_names=("video", "unused"), tp_size=1)
        cfg = OCSortConfig(max_tracks=8, max_dets=4, min_hits=1)
        V, F, D = 8, 6, 4
        ltrb = np.zeros((V, F, D, 4), np.float32)
        for f in range(F):
            ltrb[:, f, :, 0] = 10 + 5 * f
            ltrb[:, f, :, 1] = np.arange(D)[None] * 100
            ltrb[:, f, :, 2] = ltrb[:, f, :, 0] + 40
            ltrb[:, f, :, 3] = ltrb[:, f, :, 1] + 40
        dets = Detections(
            jnp.asarray(ltrb),
            jnp.full((V, F, D), 0.9, jnp.float32),
            jnp.zeros((V, F, D), jnp.float32),
            jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32), (V, F, D)),
            jnp.ones((V, F, D), bool))
        run = tracker_videos_sharded(
            lambda c, d: ocsort_scan(c, d), cfg, mesh, axis="video")
        _, out = run(dets)
        v = np.asarray(out.valid)
        assert v.shape == (V, F, cfg.max_tracks)
        # every video tracked all D objects from frame 2 onward
        assert (v[:, 2:].sum(-1) == D).all()

    def test_dryrun_multichip(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)


class TestSimOTA:
    def test_simota_train_step(self):
        import optax
        from tracklab_tpu.models.yolox import YOLOX
        from tracklab_tpu.models.train import (
            create_train_state, make_train_step,
        )
        model = YOLOX(num_classes=2, variant="nano")
        tx = optax.adam(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3), tx)
        rng = np.random.default_rng(1)
        boxes = np.zeros((2, 3, 5), np.float32)
        boxes[..., 0:2] = rng.uniform(16, 48, (2, 3, 2))
        boxes[..., 2:4] = rng.uniform(10, 20, (2, 3, 2))
        boxes[..., 4] = rng.integers(0, 2, (2, 3))
        batch = {"images": np.asarray(
            rng.uniform(0, 1, (2, 64, 64, 3)), np.float32),
            "gt_boxes": boxes, "gt_valid": np.ones((2, 3), bool)}
        step = jax.jit(make_train_step(model, tx, (64, 64)))
        state, loss0 = step(state, batch)
        for _ in range(8):
            state, loss = step(state, batch)
        assert np.isfinite(float(loss)) and float(loss) < float(loss0)


class TestPoseTrain:
    def test_heatmap_targets_and_step(self):
        import optax
        from tracklab_tpu.models.pose import TopDownPose
        from tracklab_tpu.models.pose_train import (
            gaussian_heatmaps, make_pose_train_step, PoseTrainState,
        )
        kp = jnp.asarray([[16.0, 24.0, 1.0], [5.0, 5.0, 0.0]])
        hm = gaussian_heatmaps(kp, (16, 8), (64, 32))
        assert hm.shape == (16, 8, 2)
        got = np.asarray(hm)
        # peak at the scaled keypoint location for visible kp
        iy, ix = np.unravel_index(got[..., 0].argmax(), (16, 8))
        assert (ix, iy) == (4, 6)
        assert got[..., 1].max() == 0.0  # invisible kp -> empty map

        model = TopDownPose(num_keypoints=2, variant="nano")
        tx = optax.adam(1e-3)
        rng = np.random.default_rng(0)
        crops = jnp.asarray(rng.uniform(0, 1, (2, 64, 32, 3)),
                            jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), crops, train=True)
        state = PoseTrainState(variables["params"],
                               variables.get("batch_stats", {}),
                               tx.init(variables["params"]),
                               jnp.zeros((), jnp.int32))
        kps = jnp.asarray(rng.uniform(5, 25, (2, 2, 3)), jnp.float32)
        kps = kps.at[..., 2].set(1.0)
        step = jax.jit(make_pose_train_step(model, tx, (64, 32)))
        state, loss0 = step(state, {"crops": crops, "keypoints": kps})
        for _ in range(10):
            state, loss = step(state, {"crops": crops, "keypoints": kps})
        assert float(loss) < float(loss0)


class TestYOLOv8:
    def test_forward_and_decode(self):
        from tracklab_tpu.models.yolov8 import YOLOv8
        m = YOLOv8(num_classes=3, variant="n")
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        outs = m.apply(v, x, train=False)
        assert len(outs) == 3
        assert outs[0].shape == (1, 8, 8, 4 * 16 + 3)
        dec = m.apply(v, x, method=YOLOv8.predict)
        A = 64 + 16 + 4
        assert dec.shape == (1, A, 8)
        d = np.asarray(dec)
        assert (d[..., 4] == 1.0).all()               # obj placeholder
        assert (d[..., 5:] >= 0).all() and (d[..., 5:] <= 1).all()
        # decoded sizes bounded by (reg_max-1)*2*stride
        assert (d[..., 2] >= 0).all() and (d[..., 2] <= 30 * 32 + 1).all()

    def test_decode_geometry(self):
        from tracklab_tpu.models.yolov8 import decode_v8
        # craft logits so DFL puts all mass on bin 2 for each side
        out = np.full((1, 2, 2, 4 * 16 + 1), -20.0, np.float32)
        for side in range(4):
            out[..., side * 16 + 2] = 20.0   # distance = 2 cells
        out[..., 64] = 0.0                   # cls logit -> 0.5
        dec = np.asarray(decode_v8([jnp.asarray(out)], 1, strides=(8,)))
        # anchor (0.5, 0.5): box = (0.5 +/- 2) * 8 -> size 32, center 4
        np.testing.assert_allclose(dec[0, 0, :4], [4.0, 4.0, 32.0, 32.0],
                                   atol=1e-4)


class TestRTDETR:
    def test_forward_predict_and_loss(self):
        import optax
        from tracklab_tpu.models.rtdetr import RTDETR, rtdetr_loss
        m = RTDETR(num_classes=2, num_queries=8, dim=32, dec_layers=1,
                   variant="nano")
        x = jnp.asarray(np.random.default_rng(3).uniform(
            0, 1, (1, 64, 64, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        logits, boxes = m.apply(v, x, train=False)
        assert logits.shape == (1, 8, 2)
        assert boxes.shape == (1, 8, 4)
        b = np.asarray(boxes)
        assert (b >= 0).all() and (b <= 1).all()
        xywh, scores, classes = m.apply(v, x, method=RTDETR.predict)
        assert xywh.shape == (1, 8, 4)

        # hungarian set loss trains
        rng = np.random.default_rng(0)
        gt = jnp.asarray(rng.uniform(0.2, 0.8, (1, 3, 4)), jnp.float32)
        gc = jnp.asarray([[0, 1, 0]], jnp.int32)
        gv = jnp.ones((1, 3), bool)
        tx = optax.adam(1e-3)
        params = v["params"]
        stats = v.get("batch_stats", {})
        opt = tx.init(params)

        @jax.jit
        def step(params, stats, opt):
            def loss_fn(p):
                (lg, bx), mut = m.apply(
                    {"params": p, "batch_stats": stats}, x, train=True,
                    mutable=["batch_stats"])
                return rtdetr_loss(lg, bx, gt, gc, gv, 2), \
                    mut["batch_stats"]
            (l, st), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            u, opt2 = tx.update(g, opt, params)
            import optax as ox
            return ox.apply_updates(params, u), st, opt2, l

        params, stats, opt, l0 = step(params, stats, opt)
        for _ in range(10):
            params, stats, opt, l = step(params, stats, opt)
        assert np.isfinite(float(l)) and float(l) < float(l0)


def test_torch_checkpoint_roundtrip(tmp_path):
    """convert_yolox_torch parity harness: export flax weights into an
    official-layout torch state dict, convert back, outputs identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    from tracklab_tpu.models.convert import (
        export_torch_state_dict, load_checkpoint,
    )
    from tracklab_tpu.models.yolox import YOLOX

    model = YOLOX(num_classes=3, variant="nano")
    shape = (1, 64, 64, 3)
    rng = jax.random.PRNGKey(42)
    variables = model.init(rng, jnp.zeros(shape), train=False)
    # randomize BN stats + head biases so the round trip is non-trivial
    import flax.traverse_util as tu
    flat = tu.flatten_dict(variables, sep="/")
    key = rng
    for k in flat:
        if k.endswith("mean") or (k.endswith("bias")
                                  and "BatchNorm" not in k):
            key, sub = jax.random.split(key)
            flat[k] = jax.random.normal(sub, flat[k].shape) * 0.1
    variables = tu.unflatten_dict(flat, sep="/")

    sd = export_torch_state_dict(model, variables)
    pth = tmp_path / "weights.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, pth)
    restored = load_checkpoint(pth, model, shape)

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 255, shape),
                    jnp.float32)
    a = model.apply(variables, x, method=YOLOX.predict)
    b = model.apply(restored, x, method=YOLOX.predict)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestRTMDet:
    def test_forward_and_decode(self):
        import jax
        import jax.numpy as jnp
        from tracklab_tpu.models.rtmdet import RTMDet, decode_rtmdet

        model = RTMDet(num_classes=2, variant="nano")
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        outs = model.apply(variables, x, train=False)
        assert len(outs) == 3
        for (c, r), s in zip(outs, (8, 16, 32)):
            assert c.shape == (1, 64 // s, 64 // s, 2)
            assert r.shape == (1, 64 // s, 64 // s, 4)
        dec = decode_rtmdet(outs)
        A = sum((64 // s) ** 2 for s in (8, 16, 32))
        assert dec.shape == (1, A, 7)
        # obj column is identically 1 (RTMDet has no objectness)
        assert jnp.all(dec[..., 4] == 1.0)

    def test_decode_geometry(self):
        import jax.numpy as jnp
        from tracklab_tpu.models.rtmdet import decode_rtmdet

        # one level, stride 8, 2x2 grid; reg = distances/stride
        cls = jnp.zeros((1, 2, 2, 1))
        reg = jnp.ones((1, 2, 2, 4)) * jnp.asarray([1.0, 0.5, 2.0, 1.5])
        dec = decode_rtmdet([(cls, reg)], strides=(8,))
        # grid point (1,1) -> (8, 8); distances (8, 4, 16, 12)
        xywh = dec[0, 3, :4]
        # ltrb = (0, 4, 24, 20) -> center (12, 12), size (24, 16)
        assert jnp.allclose(xywh, jnp.asarray([12.0, 12.0, 24.0, 16.0]))


def test_checkpoint_kind_dispatch():
    """Multibackend loader role (ref reid_multibackend.py:33-66):
    torch weights convert, orbax dirs restore, runtime-only exports
    raise a clear error naming the alternatives."""
    import pytest
    from tracklab_tpu.models.convert import checkpoint_kind

    assert checkpoint_kind("w.pth") == "torch"
    assert checkpoint_kind("w.pt") == "torch"
    assert checkpoint_kind("w.bin") == "torch"
    assert checkpoint_kind("ckpt_dir") == "orbax"
    # onnx now loads directly (weights parsed from the protobuf,
    # models/onnx_weights.py — the rtmlib published checkpoints)
    assert checkpoint_kind("w.onnx") == "onnx"
    # torchscript loads via torch.jit.load -> state_dict -> family
    # converter (the reference's 'jit' backend, reid_multibackend.py:39)
    assert checkpoint_kind("w.torchscript") == "torchscript"
    for suffix in ("engine", "tflite"):
        with pytest.raises(ValueError, match="torch .pth"):
            checkpoint_kind(f"w.{suffix}")


def test_torch_converter_routing():
    """load_checkpoint must route torch files to the converter of the
    MODEL's family, not YOLOX's (each family mirrors a different
    upstream key layout)."""
    import pytest
    from tracklab_tpu.models import convert as cv
    from tracklab_tpu.models.yolov8 import YOLOv8
    from tracklab_tpu.models.yolox import YOLOX
    from tracklab_tpu.models.osnet import OSNet, OSNetAIN
    from tracklab_tpu.models.vitpose import ViTPose
    from tracklab_tpu.models.rtmdet import RTMDet
    from tracklab_tpu.models.rtdetr_hf import RTDetrHF
    from tracklab_tpu.models.reid_backbones import ReidResNet

    assert cv._torch_converter_for(YOLOX(num_classes=1)) \
        is cv.convert_yolox_torch
    assert cv._torch_converter_for(YOLOv8(num_classes=1)) \
        is cv.convert_yolov8_torch
    assert cv._torch_converter_for(OSNet()) is cv.convert_osnet_torch
    assert cv._torch_converter_for(OSNetAIN()) \
        is cv.convert_reid_backbone_torch
    assert cv._torch_converter_for(ViTPose()) \
        is cv.convert_vitpose_torch
    assert cv._torch_converter_for(RTMDet()) is cv.convert_rtmdet_torch
    assert cv._torch_converter_for(RTDetrHF()) \
        is cv.convert_rtdetr_hf_torch
    assert cv._torch_converter_for(ReidResNet()) \
        is cv.convert_reid_backbone_torch
    with pytest.raises(ValueError, match="No torch-checkpoint"):
        cv._torch_converter_for(object())


def test_yolo11_wrapper_smoke():
    import numpy as np
    import pandas as pd
    import tracklab_tpu.utils.collate as Co
    from tracklab_tpu.wrappers.bbox_detector import YOLOv8Detector

    det = YOLOv8Detector(variant="11n", num_classes=1,
                         input_size=(128, 128), min_confidence=0.0,
                         max_dets=8, batch_size=1)
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3),
                                            np.uint8)
    meta = pd.DataFrame([dict(video_id=0)], index=[5])
    batch = Co.default_collate([det.preprocess(img, None, meta.iloc[0])])
    rows = det.process(batch, None, meta)
    assert isinstance(rows, list)


def test_deform_attention_backends_agree(monkeypatch):
    """The TPU one-hot MXU sampling path of MSDeformableAttention is
    bit-for-bilinear equivalent to the torch-grid_sample gather path,
    including out-of-bounds taps (zero padding) — the hat function
    max(0, 1-|p-i|) reproduces the bilinear corner weights exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tracklab_tpu.models import rtdetr_hf as R

    cfg = R.RTDetrHFConfig(d_model=32, decoder_attention_heads=4,
                           decoder_n_points=4, num_queries=7)
    spatial_shapes = [(8, 8), (4, 4), (2, 2)]
    S = sum(h * w for h, w in spatial_shapes)
    B, Q = 2, 7
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.normal(size=(B, Q, 32)), jnp.float32)
    tokens = jnp.asarray(rng.normal(size=(B, S, 32)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(B, Q, 32)), jnp.float32)
    # reference boxes pushed wide so sampling points land outside the
    # maps too (exercises the zero-padding branch of both backends)
    refs = jnp.asarray(
        np.stack([rng.uniform(-0.2, 1.2, size=(B, Q, 2)),
                  rng.uniform(0.3, 2.0, size=(B, Q, 2))],
                 axis=-2).reshape(B, Q, 4), jnp.float32)
    attn = R.MSDeformableAttention(cfg)
    v = attn.init(jax.random.PRNGKey(1), hidden, tokens, refs,
                  spatial_shapes, pos)
    outs = {}
    for mode in ("gather", "onehot", "wgrid"):
        monkeypatch.setenv("TRACKLAB_TPU_DEFORM_BACKEND", mode)
        outs[mode] = attn.apply(v, hidden, tokens, refs,
                                spatial_shapes, pos)
    for mode in ("onehot", "wgrid"):
        np.testing.assert_allclose(np.asarray(outs["gather"]),
                                   np.asarray(outs[mode]),
                                   rtol=0, atol=1e-5, err_msg=mode)
