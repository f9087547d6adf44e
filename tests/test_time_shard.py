"""Time-axis sharding (SURVEY §5 long-context equivalent): per-frame
stages shard like a batch; GMC warps need one halo ppermute."""
import numpy as np
import pytest


def test_frames_time_sharded():
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.parallel.mesh import make_mesh
    from tracklab_tpu.parallel.time_shard import frames_time_sharded

    n = len(jax.devices())
    mesh = make_mesh(n, tp_size=1)
    frames = jnp.arange(n * 4 * 6, dtype=jnp.float32).reshape(n * 4, 6)
    run = frames_time_sharded(lambda f: f * 2 + 1, mesh)
    out = np.asarray(run(frames))
    np.testing.assert_allclose(out, np.asarray(frames) * 2 + 1)


def test_gmc_warps_time_sharded():
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.parallel.mesh import make_mesh
    from tracklab_tpu.parallel.time_shard import gmc_warps_time_sharded

    n = len(jax.devices())
    F, H, W = n * 2, 48, 64
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H + 20, W + 20)).astype(np.float32)
    # smooth the texture so LK's linearization holds
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, 2, 0) + np.roll(base, 2, 1)) / 5
    # camera pans +1 px right per frame
    frames = np.stack([base[5:5 + H, 5 + t:5 + t + W] for t in range(F)])
    mesh = make_mesh(n, tp_size=1)
    run = gmc_warps_time_sharded(mesh)
    warps = np.asarray(run(jnp.asarray(frames)))
    assert warps.shape == (F, 2, 3)
    # frame 0: identity
    np.testing.assert_allclose(warps[0], np.eye(2, 3), atol=1e-6)
    # all others: ~1 px translation in -x (prev content moves left in
    # cur coords), including the shard-boundary frames (the halo)
    for t in range(1, F):
        np.testing.assert_allclose(warps[t][:, :2], np.eye(2), atol=0.05)
        assert abs(warps[t][0, 2] + 1.0) < 0.35, (t, warps[t])
        assert abs(warps[t][1, 2]) < 0.35, (t, warps[t])
