"""Pitch-line segmentation model + fixed-shape point extraction."""
import numpy as np
import pandas as pd
import pytest


def test_segnet_shapes_and_predict():
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.models.segmentation import PitchSegNet

    model = PitchSegNet(num_classes=5, variant="nano")
    x = jnp.zeros((2, 64, 96, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(v, x, train=False)
    assert logits.shape == (2, 64, 96, 5)
    cmap = model.apply(v, x, method=PitchSegNet.predict)
    assert cmap.shape == (2, 64, 96)
    assert cmap.dtype == jnp.int32


def test_seg_loss_trains():
    import jax
    import jax.numpy as jnp
    import optax
    from tracklab_tpu.models.segmentation import PitchSegNet, seg_loss

    model = PitchSegNet(num_classes=3, variant="nano")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    y = jnp.zeros((2, 64, 64), jnp.int32).at[:, 30:34, :].set(1) \
        .at[:, :, 30:34].set(2)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, state, opt):
        def loss_fn(p):
            logits, new_state = model.apply(
                {"params": p, **state}, x, train=True,
                mutable=["batch_stats"])
            return seg_loss(logits, y), new_state
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), new_state, opt, loss

    losses = []
    for _ in range(8):
        params, state, opt, loss = step(params, state, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_extract_segment_points():
    import jax.numpy as jnp
    from tracklab_tpu.models.segmentation import extract_segment_points

    cmap = np.zeros((40, 60), np.int32)
    cmap[10, 5:55] = 1          # horizontal line, 50 px
    cmap[20:30, 42] = 2         # vertical line, 10 px
    xy, valid = extract_segment_points(jnp.asarray(cmap), num_classes=4,
                                       n_points=16)
    xy, valid = np.asarray(xy), np.asarray(valid)
    assert xy.shape == (3, 16, 2) and valid.shape == (3, 16)
    # class 1: all 16 slots valid, each point on the line
    assert valid[0].all()
    assert (xy[0][:, 1] == 10).all()
    assert ((xy[0][:, 0] >= 5) & (xy[0][:, 0] < 55)).all()
    # points spread, not one clustered run
    assert np.ptp(xy[0][:, 0]) > 20
    # class 2: exactly the 10 real pixels valid
    assert valid[1].sum() == 10
    assert (xy[1][valid[1]][:, 0] == 42).all()
    # class 3 absent: nothing valid
    assert not valid[2].any()


def test_pitch_line_detector_to_calibration(tmp_path):
    """PitchLineDetector emits pitch_lines consumable by TVCalibration:
    feed a painted GT class map through extraction and recover a camera."""
    import jax.numpy as jnp
    from tracklab_tpu.calibration.camera import CameraParams, \
        project_points
    from tracklab_tpu.calibration.pitch import pitch_segments
    from tracklab_tpu.calibration.tvcalib import TVCalibConfig, \
        optimize_cameras
    from tracklab_tpu.models.segmentation import extract_segment_points

    W, H = 480, 270
    cam = CameraParams(
        pan=jnp.asarray(0.15), tilt=jnp.asarray(1.25),
        roll=jnp.asarray(0.0), focal=jnp.asarray(280.0),
        position=jnp.asarray([0.0, 45.0, 15.0]),
        principal=jnp.asarray([W / 2, H / 2]))
    segs = pitch_segments(64)
    names = list(segs)
    cmap = np.zeros((H, W), np.int32)
    for c, name in enumerate(names, start=1):
        pix, in_front = project_points(cam, jnp.asarray(segs[name]))
        pix, in_front = np.asarray(pix), np.asarray(in_front)
        inside = (in_front & (pix[:, 0] >= 0) & (pix[:, 0] < W)
                  & (pix[:, 1] >= 0) & (pix[:, 1] < H))
        for x, y in pix[inside]:
            cmap[int(y), int(x)] = c

    xy, valid = extract_segment_points(jnp.asarray(cmap),
                                       num_classes=len(names) + 1,
                                       n_points=16)
    xy, valid = np.asarray(xy), np.asarray(valid)
    obs = {name: xy[c][valid[c]] for c, name in enumerate(names)
           if valid[c].sum() >= 4}
    assert len(obs) >= 5, f"too few visible segments: {list(obs)}"
    cams, err = optimize_cameras(
        [obs], TVCalibConfig(steps=400, lr=0.05,
                             image_width=W, image_height=H))
    assert err[0] < 0.02, f"reprojection err {err[0]}"


def test_pitch_line_detector_deeplabv3_variant():
    """variant="deeplabv3" runs the reference's exact architecture
    (torchvision deeplabv3_resnet101, checkpoint-convertible — see
    tests/test_deeplabv3_parity.py) and re-indexes its 29-class argmax
    map onto the calibration segment set via the LUT gather."""
    from tracklab_tpu.utils.collate import default_collate
    from tracklab_tpu.wrappers.calibration_api import PitchLineDetector

    det = PitchLineDetector(variant="deeplabv3", input_size=(96, 160),
                            points_per_line=8)
    img = np.random.default_rng(0).integers(
        0, 255, (270, 480, 3)).astype(np.uint8)
    batch = default_collate([det.preprocess(img, None, None)])
    metas = pd.DataFrame(index=[101])
    _, rows = det.process(batch, None, metas)
    lines = rows[0]["pitch_lines"]
    assert isinstance(lines, dict)
    for name, pts in lines.items():
        assert name in det.segment_names
        assert pts.ndim == 2 and pts.shape[1] == 2
