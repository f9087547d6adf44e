"""Weight-conversion parity against INDEPENDENT torch models.

The self-round-trip test (test_models.py) cannot catch a systematic
layout misunderstanding shared by both conversion directions. These
tests initialize a genuinely independent torch implementation —
preferably the reference's own vendored source — randomize its
parameters AND BatchNorm running statistics, convert the torch state
dict into Flax variables, and compare activations on fixed inputs.
"""
import numpy as np
import pytest
import torch

import refbridge


def _randomize_module(m, seed):
    """Randomize parameters and BN buffers so layout mistakes can't hide
    behind zeros/ones defaults."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, buf in m.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) * 0.5 + 0.75)


def _state_dict_np(m):
    return {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}


# ---------------------------------------------------------------------------
# OSNet vs the reference's vendored torchreid source
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ibn", [False, True])
def test_osnet_activation_parity(ibn):
    import jax.numpy as jnp
    from tracklab_tpu.models.osnet import OSNet
    from tracklab_tpu.models.convert import convert_osnet_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import osnet as tosnet

    tm = tosnet.OSNet(num_classes=7, blocks=[tosnet.OSBlock] * 3,
                      layers=[2, 2, 2], channels=[16, 64, 96, 128],
                      IN=ibn)
    tm.eval()
    _randomize_module(tm, seed=3 + ibn)

    H, W = 256, 128
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fm = OSNet(variant="x0_25", ibn=ibn)
    variables = convert_osnet_torch(_state_dict_np(tm), fm, (1, H, W, 3))
    out = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.asarray(out["embeddings"])
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_osnet_convert_rejects_wrong_variant():
    from tracklab_tpu.models.osnet import OSNet
    from tracklab_tpu.models.convert import convert_osnet_torch

    refbridge.install_stubs()
    from strong_sort.deep.models import osnet as tosnet

    tm = tosnet.OSNet(num_classes=7, blocks=[tosnet.OSBlock] * 3,
                      layers=[2, 2, 2], channels=[16, 64, 96, 128])
    with pytest.raises(ValueError):
        convert_osnet_torch(_state_dict_np(tm), OSNet(variant="x0_5"),
                            (1, 256, 128, 3))
