"""int8 post-training quantization (models/quantize.py).

The quantized conv's math is pinned exactly on integer-valued inputs
(where symmetric int8 is lossless), then the calibrate -> int8 flow is
exercised on a full YOLOX and held to a statistical error budget vs the
f32 model on the calibration distribution.
"""
import numpy as np
import pytest


def _integer_kernel(rng, kh, kw, cin, cout):
    """Integer kernel whose per-output-channel absmax is exactly 127 so
    wscale == 1 and on-the-fly weight quantization is lossless."""
    k = rng.integers(-126, 127, (kh, kw, cin, cout)).astype(np.float32)
    k[0, 0, 0, :] = 127.0
    return k


def test_quant_conv_int8_exact_on_integers():
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.models.quantize import quant_conv_int8

    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (2, 12, 12, 8)).astype(np.float32)
    k = _integer_kernel(rng, 3, 3, 8, 16)
    got = quant_conv_int8(jnp.asarray(x), jnp.asarray(k),
                          jnp.asarray(1.0), (1, 1), [(1, 1)] * 2)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_convbnact_int8_param_tree_matches_f32():
    """quant='int8' must keep the exact params/batch_stats tree of the
    float module (checkpoints and converters are mode-agnostic)."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict
    from tracklab_tpu.models.yolox import YOLOX

    x = jnp.zeros((1, 64, 64, 3))
    v_f32 = YOLOX(num_classes=2, variant="nano").init(
        jax.random.PRNGKey(0), x, train=False)
    v_int8 = YOLOX(num_classes=2, variant="nano", quant="int8").init(
        jax.random.PRNGKey(0), x, train=False)
    for col in ("params", "batch_stats"):
        a = {k: v.shape for k, v in flatten_dict(v_f32[col]).items()}
        b = {k: v.shape for k, v in flatten_dict(v_int8[col]).items()}
        assert a == b
    assert "quant" in v_int8  # the calibrated-scale slots
    scales = flatten_dict(v_int8["quant"])
    assert scales and all(p[-1] == "ascale" for p in scales)


@pytest.mark.parametrize("variant", ["tiny"])
def test_yolox_int8_calibrated_accuracy(variant):
    """calibrate -> int8 predict stays close to f32 predict on the
    calibration distribution (random weights, 128x128)."""
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.models.quantize import calibrate_int8
    from tracklab_tpu.models.yolox import YOLOX

    H = W = 128
    rng = np.random.default_rng(1)
    model = YOLOX(num_classes=2, variant=variant)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, H, W, 3)), train=False)

    batches = [rng.uniform(0, 255, (2, H, W, 3)).astype(np.float32)
               for _ in range(2)]
    calib = YOLOX(num_classes=2, variant=variant, quant="calib")
    qvars = calibrate_int8(calib, variables, batches)

    int8 = YOLOX(num_classes=2, variant=variant, quant="int8")
    x = jnp.asarray(batches[0])
    a = np.asarray(model.apply(variables, x, method=YOLOX.predict))
    b = np.asarray(int8.apply(qvars, x, method=YOLOX.predict))
    assert a.shape == b.shape
    assert np.isfinite(b).all()
    # scores (sigmoided, [0,1]): small absolute deltas; boxes: small
    # relative to the 8-px anchor stride
    score_err = np.abs(a[..., 4:] - b[..., 4:]).max()
    box_err = np.median(np.abs(a[..., :2] - b[..., :2]))
    assert score_err < 0.05, score_err
    assert box_err < 2.0, box_err


def test_calibrate_reduces_absmax_over_batches():
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict
    from tracklab_tpu.models.quantize import calibrate_int8
    from tracklab_tpu.models.yolox import YOLOX

    H = W = 64
    model = YOLOX(num_classes=1, variant="nano")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), train=False)
    calib = YOLOX(num_classes=1, variant="nano", quant="calib")
    small = np.full((1, H, W, 3), 10.0, np.float32)
    big = np.full((1, H, W, 3), 250.0, np.float32)
    q_small = calibrate_int8(calib, variables, [small])
    q_both = calibrate_int8(calib, variables, [small, big])
    ks = flatten_dict(q_small["quant"])
    kb = flatten_dict(q_both["quant"])
    assert ks.keys() == kb.keys()
    # the stem's input scale must reflect the larger batch's absmax
    stem = [p for p in kb if "stem" in "/".join(p)]
    assert stem, list(kb)[:3]
    for p in stem:
        assert float(kb[p]) >= float(ks[p])
    assert any(float(kb[p]) > float(ks[p]) for p in stem)


def test_yolox_detector_wrapper_int8_first_batch_calibration():
    """YOLOXDetector(quant='int8') calibrates on the first processed
    batch and keeps emitting detections consistent with the f32
    wrapper on the same weights."""
    import pandas as pd
    from tracklab_tpu.wrappers.bbox_detector.yolox_api import (
        YOLOXDetector,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)

    def run(quant):
        det = YOLOXDetector(variant="nano", num_classes=1,
                            input_size=(128, 128), min_confidence=0.01,
                            max_dets=8, quant=quant)
        meta = pd.Series({"video_id": "v"}, name="img0")
        sample = det.preprocess(img, None, meta)
        batch = det.collate_fn([sample])
        rows = det.process(batch, pd.DataFrame(), pd.DataFrame([meta]))
        assert quant is None or det._qvars is not None
        return pd.DataFrame(rows)

    a, b = run(None), run("int8")
    # same weights (PRNGKey(0) init) -> the quantized detector must see
    # a comparable detection field; exact NMS survivors may differ near
    # the threshold, but both must produce valid finite boxes
    for df in (a, b):
        if len(df):
            boxes = np.stack(df["bbox_ltwh"].to_numpy())
            assert np.isfinite(boxes).all()
            assert (boxes[:, 2:] > 0).all()
    if len(a) and len(b):
        assert abs(len(a) - len(b)) <= max(2, len(a))


@pytest.mark.parametrize("family,kwargs", [
    ("yolov8", {}),
    ("yolo11", {}),
])
def test_v8_family_int8_param_tree_and_accuracy(family, kwargs):
    """YOLOv8/YOLO11 quant modes: identical params tree to f32 and a
    bounded int8-vs-f32 error on the calibration distribution."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict
    from tracklab_tpu.models.quantize import calibrate_int8

    if family == "yolov8":
        from tracklab_tpu.models.yolov8 import YOLOv8 as M
    else:
        from tracklab_tpu.models.yolo11 import YOLO11 as M

    H = W = 128
    model = M(num_classes=2, variant="n", **kwargs)
    x0 = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    v_int8 = M(num_classes=2, variant="n", quant="int8",
               **kwargs).init(jax.random.PRNGKey(0), x0, train=False)
    for col in ("params", "batch_stats"):
        a = {k: v.shape for k, v in flatten_dict(variables[col]).items()}
        b = {k: v.shape for k, v in flatten_dict(v_int8[col]).items()}
        assert a == b

    rng = np.random.default_rng(7)
    batch = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    calib = M(num_classes=2, variant="n", quant="calib", **kwargs)
    qvars = calibrate_int8(calib, variables, [batch])
    int8 = M(num_classes=2, variant="n", quant="int8", **kwargs)
    a = np.asarray(model.apply(variables, jnp.asarray(batch),
                               method=M.predict))
    b = np.asarray(int8.apply(qvars, jnp.asarray(batch),
                              method=M.predict))
    assert np.isfinite(b).all()
    # DFL box centers: median within 2 px; class scores within 0.05
    assert np.median(np.abs(a[..., :2] - b[..., :2])) < 2.0
    assert np.abs(a[..., 5:] - b[..., 5:]).max() < 0.05


@pytest.mark.parametrize("variant", ["n", "11n"])
def test_yolov8_detector_wrapper_int8(variant):
    import pandas as pd
    from tracklab_tpu.wrappers.bbox_detector.yolov8_api import (
        YOLOv8Detector,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (200, 280, 3)).astype(np.uint8)
    det = YOLOv8Detector(variant=variant, num_classes=1,
                         input_size=(128, 128), min_confidence=0.01,
                         max_dets=8, quant="int8")
    meta = pd.Series({"video_id": "v"}, name="img0")
    batch = det.collate_fn([det.preprocess(img, None, meta)])
    rows = det.process(batch, pd.DataFrame(), pd.DataFrame([meta]))
    assert det._qvars is not None  # calibrated on the first batch
    for r in rows:
        assert np.isfinite(r["bbox_ltwh"]).all()
