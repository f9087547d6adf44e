"""Global motion estimation tests: OpenCV GMC and the JAX dense LK."""
import numpy as np
import pytest


def smooth_random_image(rng, h=128, w=160):
    import scipy.ndimage as ndi
    return ndi.gaussian_filter(
        rng.uniform(0, 255, (h, w)), 3).astype(np.float32)


class TestLKJax:
    def test_recovers_translation(self):
        import scipy.ndimage as ndi
        import jax.numpy as jnp
        from tracklab_tpu.motion.lk_jax import estimate_affine_lk
        rng = np.random.default_rng(0)
        base = smooth_random_image(rng)
        cur = ndi.shift(base, (-2, 3), order=1).astype(np.float32)
        w = np.asarray(estimate_affine_lk(jnp.asarray(base),
                                          jnp.asarray(cur)))
        np.testing.assert_allclose(w[:, 2], [3.0, -2.0], atol=0.15)
        np.testing.assert_allclose(w[:, :2], np.eye(2), atol=0.01)

    def test_recovers_small_rotation(self):
        import scipy.ndimage as ndi
        import jax.numpy as jnp
        from tracklab_tpu.motion.lk_jax import estimate_affine_lk
        rng = np.random.default_rng(1)
        base = smooth_random_image(rng)
        ang = 1.0  # degrees
        cur = ndi.rotate(base, ang, reshape=False, order=1)
        w = np.asarray(estimate_affine_lk(jnp.asarray(base),
                                          jnp.asarray(cur)))
        # rotation about the array center: linear part close to R(ang)
        th = np.deg2rad(ang)
        R = np.array([[np.cos(th), np.sin(th)],
                      [-np.sin(th), np.cos(th)]])
        np.testing.assert_allclose(w[:, :2], R, atol=0.02)


class TestGMCModule:
    def test_sparse_flow_translation(self):
        import scipy.ndimage as ndi
        from tracklab_tpu.motion.gmc import GMC
        rng = np.random.default_rng(2)
        base = smooth_random_image(rng, 240, 320)
        img_prev = np.stack([base] * 3, -1).astype(np.uint8)
        cur = ndi.shift(base, (4, -6), order=1)
        img_cur = np.stack([cur] * 3, -1).astype(np.uint8)
        gmc = GMC("sparseOptFlow", downscale=1)
        H = gmc.apply(img_prev, img_cur)
        np.testing.assert_allclose(H[:, 2], [-6.0, 4.0], atol=1.0)

    def test_lk_jax_method(self):
        import scipy.ndimage as ndi
        from tracklab_tpu.motion.gmc import GMC
        rng = np.random.default_rng(3)
        base = smooth_random_image(rng, 240, 320)
        img_prev = np.stack([base] * 3, -1).astype(np.uint8)
        cur = ndi.shift(base, (4, -6), order=1)
        img_cur = np.stack([cur] * 3, -1).astype(np.uint8)
        gmc = GMC("lk_jax", downscale=2)
        H = gmc.apply(img_prev, img_cur)
        np.testing.assert_allclose(H[:, 2], [-6.0, 4.0], atol=1.0)

    def test_identity_on_first_frame(self):
        from tracklab_tpu.motion.gmc import GMC
        H = GMC("sparseOptFlow").apply(None, np.zeros((64, 64, 3),
                                                      np.uint8))
        np.testing.assert_allclose(H, np.eye(2, 3))


def corner_rich_image(rng, h=240, w=320):
    """High-contrast random rectangles: plenty of FAST/ORB corners."""
    img = np.zeros((h, w), np.float32)
    for _ in range(60):
        y, x = rng.integers(10, h - 30), rng.integers(10, w - 30)
        bh, bw = rng.integers(6, 24, size=2)
        img[y:y + bh, x:x + bw] = rng.uniform(60, 255)
    return img


class TestGMCFeatureMethods:
    """ORB/SIFT registration recovers a known synthetic warp
    (VERDICT #7: warp-recovery vs cv2 on synthetically warped frames;
    ref plugins/track/bot_sort/gmc.py:113-238)."""

    @pytest.mark.parametrize("method", ["orb", "sift"])
    def test_recovers_translation(self, method):
        import cv2
        if method == "sift" and not hasattr(cv2, "SIFT_create"):
            pytest.skip("cv2 without SIFT")
        from tracklab_tpu.motion.gmc import GMC
        rng = np.random.default_rng(7)
        base = corner_rich_image(rng)
        M = np.float32([[1, 0, -6], [0, 1, 4]])
        cur = cv2.warpAffine(base, M, (base.shape[1], base.shape[0]))
        img_prev = np.stack([base] * 3, -1).astype(np.uint8)
        img_cur = np.stack([cur] * 3, -1).astype(np.uint8)
        H = GMC(method, downscale=1).apply(img_prev, img_cur)
        np.testing.assert_allclose(H[:, 2], [-6.0, 4.0], atol=1.0)
        np.testing.assert_allclose(H[:, :2], np.eye(2), atol=0.02)

    def test_recovers_rotation_with_downscale(self):
        import cv2
        from tracklab_tpu.motion.gmc import GMC
        rng = np.random.default_rng(8)
        base = corner_rich_image(rng, 480, 640)
        ang = 2.0
        M = cv2.getRotationMatrix2D((320, 240), ang, 1.0)
        cur = cv2.warpAffine(base, M, (640, 480))
        img_prev = np.stack([base] * 3, -1).astype(np.uint8)
        img_cur = np.stack([cur] * 3, -1).astype(np.uint8)
        H = GMC("orb", downscale=2).apply(img_prev, img_cur)
        np.testing.assert_allclose(H[:, :2], M[:, :2], atol=0.02)
        # translation recovered at full resolution despite downscale=2
        np.testing.assert_allclose(H[:, 2], M[:, 2], atol=3.0)

    def test_detection_mask_accepted(self):
        import cv2
        from tracklab_tpu.motion.gmc import GMC
        rng = np.random.default_rng(9)
        base = corner_rich_image(rng)
        M = np.float32([[1, 0, 3], [0, 1, -2]])
        cur = cv2.warpAffine(base, M, (base.shape[1], base.shape[0]))
        img_prev = np.stack([base] * 3, -1).astype(np.uint8)
        img_cur = np.stack([cur] * 3, -1).astype(np.uint8)
        dets = np.array([[40.0, 40.0, 120.0, 120.0]])
        H = GMC("orb", downscale=1).apply(img_prev, img_cur,
                                          prev_dets=dets, cur_dets=dets)
        np.testing.assert_allclose(H[:, 2], [3.0, -2.0], atol=1.0)


class TestGMCFile:
    def test_playback(self, tmp_path):
        from tracklab_tpu.motion.gmc import GMC
        lines = []
        warps = []
        rng = np.random.default_rng(10)
        for t in range(3):
            h = np.eye(2, 3) + rng.normal(scale=0.01, size=(2, 3))
            warps.append(h)
            lines.append("\t".join(
                [str(t)] + [repr(float(x)) for x in h.ravel()]))
        f = tmp_path / "GMC-MOT17-02.txt"
        f.write_text("\n".join(lines) + "\n")
        gmc = GMC("file", gmc_file=str(f))
        frame = np.zeros((32, 32, 3), np.uint8)
        # one line consumed per frame, first frame included
        for t in range(3):
            H = gmc.apply(None if t == 0 else frame, frame)
            np.testing.assert_allclose(H, warps[t], rtol=1e-6)
        # past EOF: identity
        np.testing.assert_allclose(gmc.apply(frame, frame), np.eye(2, 3))

    def test_mot_name_resolution(self, tmp_path):
        from tracklab_tpu.motion.gmc import GMC
        f = tmp_path / "GMC-MOT17-04.txt"
        f.write_text("0\t1\t0\t5\t0\t1\t-3\n")
        gmc = GMC("file", gmc_file_dir=str(tmp_path),
                  seq_name="MOT17-04-FRCNN")
        H = gmc.apply(None, np.zeros((8, 8, 3), np.uint8))
        np.testing.assert_allclose(H, [[1, 0, 5], [0, 1, -3]])


def test_gmc_file_reset_rewinds(tmp_path):
    """Per-video reset() replays the file from its first line
    (CameraMotion.reset runs at each video start)."""
    from tracklab_tpu.motion.gmc import GMC
    f = tmp_path / "GMC-X.txt"
    f.write_text("0\t1\t0\t5\t0\t1\t-3\n1\t1\t0\t7\t0\t1\t2\n")
    gmc = GMC("file", gmc_file=str(f))
    frame = np.zeros((8, 8, 3), np.uint8)
    first = gmc.apply(None, frame)
    gmc.apply(frame, frame)
    gmc.reset()
    again = gmc.apply(None, frame)
    np.testing.assert_allclose(first, again)
    gmc.close()
