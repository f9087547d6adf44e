"""Golden-value tests for box geometry vs independent numpy oracles.

Oracle formulas are re-derived from the reference's documented behavior
(plugins/track/oc_sort/association.py) in plain numpy here, then the JAX
kernels are checked against them on random boxes.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tracklab_tpu.ops import boxes


def random_ltrb(rng, n):
    x1 = rng.uniform(0, 500, n)
    y1 = rng.uniform(0, 500, n)
    w = rng.uniform(5, 200, n)
    h = rng.uniform(5, 200, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1)


def np_iou(b1, b2):
    b1 = b1[:, None, :]
    b2 = b2[None, :, :]
    xx1 = np.maximum(b1[..., 0], b2[..., 0])
    yy1 = np.maximum(b1[..., 1], b2[..., 1])
    xx2 = np.minimum(b1[..., 2], b2[..., 2])
    yy2 = np.minimum(b1[..., 3], b2[..., 3])
    inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1 + a2 - inter)


class TestConversions:
    def test_roundtrips(self):
        rng = np.random.default_rng(0)
        b = jnp.asarray(random_ltrb(rng, 64))
        np.testing.assert_allclose(
            boxes.ltwh_to_ltrb(boxes.ltrb_to_ltwh(b)), b, atol=1e-9)
        np.testing.assert_allclose(
            boxes.xywh_to_ltrb(boxes.ltrb_to_xywh(b)), b, atol=1e-9)
        ltwh = boxes.ltrb_to_ltwh(b)
        np.testing.assert_allclose(
            boxes.xyah_to_ltwh(boxes.ltwh_to_xyah(ltwh)), ltwh, atol=1e-9)
        np.testing.assert_allclose(
            boxes.xysr_to_ltrb(boxes.ltrb_to_xysr(b, eps=0.0)), b, atol=1e-6)

    def test_xysr_matches_reference_formula(self):
        # ocsort.py convert_bbox_to_z: x,y center; s = w*h; r = w/(h+1e-6)
        b = jnp.array([[10.0, 20.0, 50.0, 100.0]])
        z = boxes.ltrb_to_xysr(b)[0]
        np.testing.assert_allclose(
            np.asarray(z), [30.0, 60.0, 3200.0, 40.0 / 80.000001], rtol=1e-9)

    def test_xysr_negative_area_gives_nan(self):
        z = jnp.array([[5.0, 5.0, -10.0, 1.0]])
        assert np.isnan(np.asarray(boxes.xysr_to_ltrb(z))).any()


class TestPairwise:
    @pytest.fixture
    def pair(self):
        rng = np.random.default_rng(1)
        return random_ltrb(rng, 17), random_ltrb(rng, 9)

    def test_iou(self, pair):
        b1, b2 = pair
        got = boxes.iou_matrix(jnp.asarray(b1), jnp.asarray(b2))
        np.testing.assert_allclose(np.asarray(got), np_iou(b1, b2), rtol=1e-12)

    def test_iou_self_is_one(self, pair):
        b1, _ = pair
        got = np.asarray(boxes.iou_matrix(jnp.asarray(b1), jnp.asarray(b1)))
        np.testing.assert_allclose(np.diag(got), 1.0, rtol=1e-12)

    def test_giou_range_and_iou_agreement(self, pair):
        b1, b2 = pair
        giou = np.asarray(boxes.giou_matrix(jnp.asarray(b1), jnp.asarray(b2)))
        assert (giou >= -1e-9).all() and (giou <= 1 + 1e-9).all()
        # identical boxes: giou == 1 -> rescaled to 1.0
        same = np.asarray(boxes.giou_matrix(jnp.asarray(b1), jnp.asarray(b1)))
        np.testing.assert_allclose(np.diag(same), 1.0, atol=1e-12)

    def test_diou_matches_oracle(self, pair):
        b1, b2 = pair
        iou = np_iou(b1, b2)
        e1, e2 = b1[:, None, :], b2[None, :, :]
        cxd = ((e1[..., 0] + e1[..., 2]) - (e2[..., 0] + e2[..., 2])) / 2
        cyd = ((e1[..., 1] + e1[..., 3]) - (e2[..., 1] + e2[..., 3])) / 2
        inner = cxd ** 2 + cyd ** 2
        xc1 = np.minimum(e1[..., 0], e2[..., 0])
        yc1 = np.minimum(e1[..., 1], e2[..., 1])
        xc2 = np.maximum(e1[..., 2], e2[..., 2])
        yc2 = np.maximum(e1[..., 3], e2[..., 3])
        outer = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2
        want = (iou - inner / outer + 1) / 2
        got = np.asarray(boxes.diou_matrix(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_ciou_matches_oracle(self, pair):
        b1, b2 = pair
        iou = np_iou(b1, b2)
        e1, e2 = b1[:, None, :], b2[None, :, :]
        cxd = ((e1[..., 0] + e1[..., 2]) - (e2[..., 0] + e2[..., 2])) / 2
        cyd = ((e1[..., 1] + e1[..., 3]) - (e2[..., 1] + e2[..., 3])) / 2
        inner = cxd ** 2 + cyd ** 2
        xc1 = np.minimum(e1[..., 0], e2[..., 0])
        yc1 = np.minimum(e1[..., 1], e2[..., 1])
        xc2 = np.maximum(e1[..., 2], e2[..., 2])
        yc2 = np.maximum(e1[..., 3], e2[..., 3])
        outer = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2
        w1 = e1[..., 2] - e1[..., 0]
        h1 = e1[..., 3] - e1[..., 1] + 1.0
        w2 = e2[..., 2] - e2[..., 0]
        h2 = e2[..., 3] - e2[..., 1] + 1.0
        v = (4 / np.pi ** 2) * (np.arctan(w2 / h2) - np.arctan(w1 / h1)) ** 2
        alpha = v / ((1 - iou) + v)
        want = (iou - inner / outer - alpha * v + 1) / 2
        got = np.asarray(boxes.ciou_matrix(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_ct_dist_matches_reference(self, pair):
        b1, b2 = pair
        # reference oracle
        e1, e2 = b1[:, None, :], b2[None, :, :]
        cx1 = (e1[..., 0] + e1[..., 2]) / 2
        cy1 = (e1[..., 1] + e1[..., 3]) / 2
        cx2 = (e2[..., 0] + e2[..., 2]) / 2
        cy2 = (e2[..., 1] + e2[..., 3]) / 2
        d = np.sqrt((cx1 - cx2) ** 2 + (cy1 - cy2) ** 2)
        want = d.max() - d / d.max()
        # reference divides then subtracts the *new* max (== 1)
        want = 1.0 - d / d.max()
        got = np.asarray(boxes.ct_dist_matrix(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_masked_ct_dist_ignores_padding(self, pair):
        b1, b2 = pair
        pad1 = np.concatenate([b1, np.full((3, 4), 1e9)], axis=0)
        mask = np.ones((pad1.shape[0], b2.shape[0]), bool)
        mask[len(b1):] = False
        got = np.asarray(boxes.ct_dist_matrix(
            jnp.asarray(pad1), jnp.asarray(b2), mask=jnp.asarray(mask)))
        want = np.asarray(boxes.ct_dist_matrix(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(got[: len(b1)], want, rtol=1e-9)

    def test_pairwise_iou_zero_union_safe(self):
        degenerate = jnp.array([[5.0, 5.0, 5.0, 5.0]])
        got = boxes.pairwise_iou(degenerate, degenerate)
        assert np.asarray(got)[0, 0] == 0.0
