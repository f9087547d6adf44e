"""YOLOv8/YOLO11 training loss (models/yolov8_train.py): TAL assigner
semantics on hand-built cases + end-to-end loss descent."""
import numpy as np
import pytest


def _setup_jax():
    import jax
    return jax, jax.numpy


def test_tal_assign_basic():
    """One GT box: only anchors inside it are assignable, at most topk
    are chosen, and the soft weights are positive exactly on them."""
    jax, jnp = _setup_jax()
    from tracklab_tpu.models.yolov8_train import tal_assign

    # 8x8 grid of anchors, stride 8 -> pixels 4..60
    g = np.arange(8) * 8.0 + 4.0
    anchors = np.stack(np.meshgrid(g, g, indexing="xy"),
                       -1).reshape(-1, 2).astype(np.float32)
    A = anchors.shape[0]
    C = 3
    rng = np.random.default_rng(0)
    pred_scores = rng.uniform(0.2, 0.9, (A, C)).astype(np.float32)
    # predictions roughly centered on the anchor
    pred_xyxy = np.concatenate([anchors - 6, anchors + 6],
                               -1).astype(np.float32)
    gt_xyxy = np.array([[10.0, 10.0, 40.0, 40.0],
                        [0.0, 0.0, 0.0, 0.0]], np.float32)
    gt_cls = np.array([1, 0], np.int32)
    gt_valid = np.array([True, False])

    assigned, fg, w = jax.jit(tal_assign)(
        jnp.asarray(pred_scores), jnp.asarray(pred_xyxy),
        jnp.asarray(anchors), jnp.asarray(gt_xyxy),
        jnp.asarray(gt_cls), jnp.asarray(gt_valid))
    assigned, fg, w = map(np.asarray, (assigned, fg, w))
    assert fg.any() and fg.sum() <= 10
    inside = ((anchors[:, 0] > 10) & (anchors[:, 0] < 40)
              & (anchors[:, 1] > 10) & (anchors[:, 1] < 40))
    assert (inside | ~fg).all()          # positives only inside the box
    assert (assigned[fg] == 0).all()     # all assigned to the real GT
    assert (w[fg] > 0).all() and (w[~fg] == 0).all()
    assert w.max() <= 1.0 + 1e-6


def test_tal_conflict_resolves_to_highest_overlap():
    """An anchor inside two GTs must go to the one its prediction
    overlaps more."""
    jax, jnp = _setup_jax()
    from tracklab_tpu.models.yolov8_train import tal_assign

    anchors = np.array([[20.0, 20.0]], np.float32)
    # prediction == GT 1's box exactly
    pred_xyxy = np.array([[15.0, 15.0, 30.0, 30.0]], np.float32)
    pred_scores = np.full((1, 2), 0.5, np.float32)
    gt_xyxy = np.array([[0.0, 0.0, 40.0, 40.0],      # big box
                        [15.0, 15.0, 30.0, 30.0]],   # exact match
                       np.float32)
    gt_cls = np.array([0, 1], np.int32)
    gt_valid = np.array([True, True])
    assigned, fg, _ = tal_assign(
        jnp.asarray(pred_scores), jnp.asarray(pred_xyxy),
        jnp.asarray(anchors), jnp.asarray(gt_xyxy),
        jnp.asarray(gt_cls), jnp.asarray(gt_valid))
    assert bool(np.asarray(fg)[0])
    assert int(np.asarray(assigned)[0]) == 1


def test_v8_loss_decreases():
    jax, jnp = _setup_jax()
    import optax
    from tracklab_tpu.models.yolov8 import YOLOv8
    from tracklab_tpu.models.yolov8_train import v8_detection_loss

    H = W = 96
    model = YOLOv8(num_classes=2, variant="n")
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, H, W, 3)), jnp.float32)
    gt = np.zeros((2, 4, 5), np.float32)
    gt[0, 0] = [30, 30, 24, 24, 0]
    gt[0, 1] = [70, 60, 20, 30, 1]
    gt[1, 0] = [48, 48, 40, 40, 1]
    gv = np.zeros((2, 4), bool)
    gv[0, :2] = True
    gv[1, 0] = True
    gt, gv = jnp.asarray(gt), jnp.asarray(gv)

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), train=False)
    params = variables["params"]
    bs = variables["batch_stats"]
    tx = optax.adamw(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt):
        def loss_fn(p, b):
            outs, mut = model.apply({"params": p, "batch_stats": b},
                                    imgs, train=True,
                                    mutable=["batch_stats"])
            return v8_detection_loss(outs, gt, gv, (H, W), 2), \
                mut["batch_stats"]
        (loss, b2), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bs)
        upd, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), b2, opt2, loss

    losses = []
    for _ in range(12):
        params, bs, opt, loss = step(params, bs, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_yolov8_wrapper_finetuning(tmp_path):
    """module.train() through the wrapper: same engine as YOLOX with the
    v8 TAL/DFL loss picked via detection_loss_fn."""
    from test_offline_detector import render_frames
    from tracklab_tpu.datastruct.tracking_dataset import TrackingDataset
    from tracklab_tpu.wrappers.bbox_detector import YOLOv8Detector

    ts = render_frames(tmp_path, n_frames=8)
    ds = TrackingDataset(str(tmp_path), {"train": ts})
    det = YOLOv8Detector(variant="n", num_classes=1,
                         input_size=(128, 128), batch_size=2)
    metrics = det.train(ds, epochs=2, batch_size=4, max_images=8)
    assert "loss" in metrics
    assert np.isfinite(metrics["loss"][-1])
    assert metrics["loss"][-1] < metrics["loss"][0] * 1.5
    det._build()
    assert det._infer is not None
