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
