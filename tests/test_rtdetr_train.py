"""RT-DETR fine-tuning (models/rtdetr_train.py): HF RTDetrLoss
semantics (Hungarian match + VFL/L1/GIoU) on hand-built cases, loss
descent, and the wrapper train() hook (VERDICT r3 item 8 — the
NotImplementedError at rtdetr_api.py:220 is now the real loop)."""
import numpy as np
import pytest


def test_rtdetr_loss_prefers_correct_prediction():
    import jax.numpy as jnp
    from tracklab_tpu.models.rtdetr_train import rtdetr_detection_loss

    H = W = 100
    Q, G, C = 6, 2, 3
    gt = np.zeros((1, G, 5), np.float32)
    gt[0, 0] = [30, 30, 20, 20, 1]   # cxcywh pixels + class
    gt[0, 1] = [70, 60, 10, 30, 2]
    gv = np.ones((1, G), bool)

    def mk(boxes_px, logit_val):
        boxes = np.full((1, Q, 4), 0.5, np.float32)
        logits = np.full((1, Q, C), -4.0, np.float32)
        for q, (b, c) in enumerate(boxes_px):
            boxes[0, q] = np.asarray(b, float) / [W, H, W, H]
            logits[0, q, c] = logit_val
        return jnp.asarray(logits), jnp.asarray(boxes)

    good = mk([((30, 30, 20, 20), 1), ((70, 60, 10, 30), 2)], 4.0)
    bad = mk([((80, 80, 5, 5), 0), ((10, 10, 40, 3), 0)], 4.0)
    lg = float(rtdetr_detection_loss(good, jnp.asarray(gt),
                                     jnp.asarray(gv), (H, W), C))
    lb = float(rtdetr_detection_loss(bad, jnp.asarray(gt),
                                     jnp.asarray(gv), (H, W), C))
    assert np.isfinite(lg) and np.isfinite(lb)
    assert lg < lb * 0.5, (lg, lb)

    # empty GT: pure background loss, finite and smaller for confident
    # background predictions
    gv0 = np.zeros((1, G), bool)
    l0 = float(rtdetr_detection_loss(good, jnp.asarray(gt),
                                     jnp.asarray(gv0), (H, W), C))
    assert np.isfinite(l0)


def test_rtdetr_loss_decreases():
    import jax
    import jax.numpy as jnp
    import optax
    from tracklab_tpu.models.rtdetr import RTDETR
    from tracklab_tpu.models.rtdetr_train import rtdetr_detection_loss

    H = W = 96
    model = RTDETR(num_classes=2, num_queries=12, dim=64, dec_layers=1,
                   variant="nano")
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, H, W, 3)), jnp.float32)
    gt = np.zeros((2, 3, 5), np.float32)
    gt[0, 0] = [30, 30, 24, 24, 0]
    gt[0, 1] = [70, 60, 20, 30, 1]
    gt[1, 0] = [48, 48, 40, 40, 1]
    gv = np.zeros((2, 3), bool)
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
            return rtdetr_detection_loss(outs, gt, gv, (H, W), 2), \
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


def test_rtdetr_wrapper_finetuning(tmp_path):
    """module.train() through the wrapper: the shared detector engine
    with the DETR set-matching criterion picked via detection_loss_fn."""
    from test_offline_detector import render_frames
    from tracklab_tpu.datastruct.tracking_dataset import TrackingDataset
    from tracklab_tpu.wrappers.bbox_detector import RTDETRDetector

    ts = render_frames(tmp_path, n_frames=8)
    ds = TrackingDataset(str(tmp_path), {"train": ts})
    det = RTDETRDetector(variant="nano", num_classes=1,
                         input_size=(128, 128), num_queries=12,
                         batch_size=2)
    metrics = det.train(ds, epochs=2, batch_size=4, max_images=8)
    assert "loss" in metrics
    assert np.isfinite(metrics["loss"][-1])
    det._build()
    assert det._infer is not None
