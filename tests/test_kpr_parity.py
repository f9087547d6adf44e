"""KPR model: activation parity vs an independently-written torch oracle.

The reference instantiates KPR from the authors' torchreid fork
(tracklab/wrappers/reid/kpreid_api.py:87 ``build_model``), which is not
importable in this container. The oracle below is written independently
from the published architecture (promptable ViT + BPBReID part head) with
the state-dict naming the converter expects; conversion + forward parity
proves the converter's relayout/name map and the Flax model agree on
every branch of the output. The checkpoint-manifest test
(test_checkpoint_manifests.py) pins the expected key set so a real
``kpr_*.pth.tar`` under cache/ is validated with zero code changes.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tracklab_tpu.models.convert import convert_kpr_torch
from tracklab_tpu.models.kpr import KPR, extract_test_embeddings

# tiny geometry: grid (4, 2), 5 parts, 7 prompt channels
ARCH = dict(num_parts=5, dim_reduce_output=32, img_size=(64, 32),
            patch_size=16, stride=16, embed_dim=64, depth=2,
            num_heads=2, n_prompt_ch=7)


# ---------------------------------------------------------------------------
# torch oracle (independent implementation)
# ---------------------------------------------------------------------------
class _TBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(d, 3 * d)
        self.attn.proj = tnn.Linear(d, d)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(d, 4 * d)
        self.mlp.fc2 = tnn.Linear(4 * d, d)
        self.h = h

    def forward(self, x):
        B, N, D = x.shape
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, self.h, D // self.h)
        q, k, v = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))
        a = (q @ k.transpose(-2, -1)) / math.sqrt(D // self.h)
        a = a.softmax(-1)
        y = (a @ v).permute(0, 2, 1, 3).reshape(B, N, D)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y


class _TBackbone(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg["embed_dim"]
        p, s = cfg["patch_size"], cfg["stride"]
        h, w = cfg["img_size"]
        gh, gw = (h - p) // s + 1, (w - p) // s + 1
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, d, p, stride=s)
        self.prompt_embed = tnn.Module()
        self.prompt_embed.proj = tnn.Conv2d(cfg["n_prompt_ch"], d, p,
                                            stride=s)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = tnn.Parameter(torch.zeros(1, 1 + gh * gw, d))
        self.blocks = tnn.ModuleList(
            [_TBlock(d, cfg["num_heads"]) for _ in range(cfg["depth"])])
        self.norm = tnn.LayerNorm(d, eps=1e-6)
        self.grid = (gh, gw)

    def forward(self, x, prompts):
        B = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = t + self.prompt_embed.proj(prompts).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        gh, gw = self.grid
        return x[:, 0], x[:, 1:].reshape(B, gh, gw, -1)


class _TKPR(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, red, K = cfg["embed_dim"], cfg["dim_reduce_output"], \
            cfg["num_parts"]
        self.backbone = _TBackbone(cfg)
        self.pixel_classifier = tnn.Linear(d, K + 1)
        self.dim_reduce_global = tnn.Linear(d, red)
        self.dim_reduce_foreground = tnn.Linear(d, red)
        self.dim_reduce_concat_parts = tnn.Linear(K * d, red)
        self.dim_reduce_parts = tnn.Linear(d, red)
        self.bn_global = tnn.BatchNorm1d(red)
        self.bn_foreground = tnn.BatchNorm1d(red)
        self.bn_concat_parts = tnn.BatchNorm1d(red)
        self.bn_parts = tnn.BatchNorm1d(red)
        self.K = K

    @staticmethod
    def _gwap(feat, attn):
        w = attn[..., None]
        return (feat * w).sum((1, 2)) / (w.sum((1, 2)) + 1e-6)

    def forward(self, x, prompts):
        _, spat = self.backbone(x, prompts)
        B = spat.shape[0]
        logits = self.pixel_classifier(spat)
        attn = logits.softmax(-1)
        globl = self.dim_reduce_global(spat.mean((1, 2)))
        foreg = self.dim_reduce_foreground(
            self._gwap(spat, 1.0 - attn[..., 0]))
        parts_raw = torch.stack(
            [self._gwap(spat, attn[..., 1 + k]) for k in range(self.K)],
            dim=1)
        conct = self.dim_reduce_concat_parts(parts_raw.reshape(B, -1))
        parts = self.dim_reduce_parts(parts_raw)
        return {
            "globl": globl, "foreg": foreg, "conct": conct,
            "parts": parts,
            "bn_globl": self.bn_global(globl),
            "bn_foreg": self.bn_foreground(foreg),
            "bn_conct": self.bn_concat_parts(conct),
            "bn_parts": self.bn_parts(
                parts.reshape(-1, parts.shape[-1])).reshape(parts.shape),
            "attn": attn,
            "vis_foreg": (1.0 - attn[..., 0]).amax((1, 2)),
            "vis_parts": attn[..., 1:].amax((1, 2)),
        }


def _randomized_oracle(seed=0):
    torch.manual_seed(seed)
    model = _TKPR(ARCH)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.5)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted():
    oracle = _randomized_oracle()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    model = KPR(**ARCH)
    h, w = ARCH["img_size"]
    variables = convert_kpr_torch(sd, model, (1, h, w, 3))
    return oracle, model, variables


def test_kpr_activation_parity(converted):
    oracle, model, variables = converted
    h, w = ARCH["img_size"]
    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (3, h, w, 3)).astype(np.float32)
    prm = rng.uniform(0, 1, (3, h, w, ARCH["n_prompt_ch"])).astype(
        np.float32)
    with torch.no_grad():
        t = oracle(torch.from_numpy(img).permute(0, 3, 1, 2),
                   torch.from_numpy(prm).permute(0, 3, 1, 2))
    f = model.apply(variables, jnp.asarray(img), jnp.asarray(prm),
                    train=False)
    for key in ("globl", "foreg", "conct", "parts", "bn_globl",
                "bn_foreg", "bn_conct", "bn_parts"):
        np.testing.assert_allclose(np.asarray(f[key]), t[key].numpy(),
                                   rtol=2e-4, atol=2e-5, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(f["visibility"]["foreg"]), t["vis_foreg"].numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f["visibility"]["parts"]), t["vis_parts"].numpy(),
        rtol=1e-5, atol=1e-6)


def test_kpr_prompt_changes_embeddings(converted):
    """With converted (non-zero prompt-conv) weights, prompting a region
    must change the embedding — the promptable path is live."""
    _, model, variables = converted
    h, w = ARCH["img_size"]
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(0, 1, (1, h, w, 3)), jnp.float32)
    zeros = jnp.zeros((1, h, w, ARCH["n_prompt_ch"]))
    ones = zeros.at[:, : h // 2, :, 0].set(1.0)
    f0 = model.apply(variables, img, zeros, train=False)
    f1 = model.apply(variables, img, ones, train=False)
    assert float(jnp.abs(f0["bn_foreg"] - f1["bn_foreg"]).max()) > 1e-4


def test_kpr_zero_init_prompt_is_identity():
    """At init the prompt conv is zero — all-zero vs all-one prompts give
    identical features (no-prompt backward compatibility,
    promptable_trans.masks_prompting off)."""
    model = KPR(**ARCH)
    h, w = ARCH["img_size"]
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(0, 1, (1, h, w, 3)), jnp.float32)
    zeros = jnp.zeros((1, h, w, ARCH["n_prompt_ch"]))
    variables = model.init(jax.random.PRNGKey(0), img, zeros, train=False)
    f0 = model.apply(variables, img, zeros, train=False)
    f1 = model.apply(variables, img, zeros + 1.0, train=False)
    np.testing.assert_allclose(np.asarray(f0["bn_foreg"]),
                               np.asarray(f1["bn_foreg"]), atol=1e-6)


def test_kpr_alias_prefixes_convert():
    """BPBReID-lineage attribute spellings load through _KPR_ALIASES."""
    oracle = _randomized_oracle(3)
    sd = {}
    for k, v in oracle.state_dict().items():
        if k.startswith("backbone."):
            k = "backbone_appearance_feature_extractor." + \
                k[len("backbone."):]
        elif k.startswith("bn_global."):
            k = "global_identity_classifier.bn." + k[len("bn_global."):]
        elif k.startswith("dim_reduce_global."):
            k = "global_after_pooling_dim_reduce." + \
                k[len("dim_reduce_global."):]
        sd[k] = v.numpy()
    model = KPR(**ARCH)
    h, w = ARCH["img_size"]
    variables = convert_kpr_torch(sd, model, (1, h, w, 3))
    rng = np.random.default_rng(4)
    img = rng.normal(0, 1, (2, h, w, 3)).astype(np.float32)
    prm = np.zeros((2, h, w, ARCH["n_prompt_ch"]), np.float32)
    with torch.no_grad():
        t = oracle(torch.from_numpy(img).permute(0, 3, 1, 2),
                   torch.from_numpy(prm).permute(0, 3, 1, 2))
    f = model.apply(variables, jnp.asarray(img), jnp.asarray(prm),
                    train=False)
    np.testing.assert_allclose(np.asarray(f["bn_foreg"]),
                               t["bn_foreg"].numpy(), rtol=2e-4,
                               atol=2e-5)


def test_extract_test_embeddings_layout():
    """['bn_foreg','parts'] -> (B, 1+K, D) embeddings with row 0 the
    foreground feature, binary visibility (kpreid_api.py:154-161 +
    testing_binary_visibility_score)."""
    model = KPR(**ARCH)
    h, w = ARCH["img_size"]
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(0, 1, (2, h, w, 3)), jnp.float32)
    zeros = jnp.zeros((2, h, w, ARCH["n_prompt_ch"]))
    variables = model.init(jax.random.PRNGKey(1), img, zeros, train=False)
    out = model.apply(variables, img, zeros, train=False)
    emb, vis = extract_test_embeddings(out, ("bn_foreg", "parts"))
    K, D = ARCH["num_parts"], ARCH["dim_reduce_output"]
    assert emb.shape == (2, 1 + K, D)
    assert vis.shape == (2, 1 + K)
    assert set(np.unique(np.asarray(vis))) <= {0.0, 1.0}
    np.testing.assert_allclose(np.asarray(emb[:, 0]),
                               np.asarray(out["bn_foreg"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[:, 1:]),
                               np.asarray(out["parts"]), atol=1e-6)


def test_attention_impls_agree():
    """attn_impl="dpa" (jax.nn.dot_product_attention) computes the same
    attention as the naive path — same params, outputs equal to f32
    precision — so the fused-engine A/B switch is parity-safe."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tracklab_tpu.models.kpr import KPR, extract_test_embeddings

    kw = dict(num_parts=3, dim_reduce_output=32, img_size=(64, 32),
              patch_size=8, stride=8, embed_dim=64, depth=2, num_heads=4)
    naive = KPR(attn_impl="naive", **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 64, 32, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(0, 1, (3, 64, 32, 7)), jnp.float32)
    variables = naive.init(jax.random.PRNGKey(0), x, p, train=False)
    # identical param trees: impl only changes the lowering ("pallas"
    # runs the ops/vit_attention_pallas fused kernel, interpret mode
    # off-TPU)
    out_n = naive.apply(variables, x, p, train=False)
    e_n, v_n = extract_test_embeddings(out_n)
    for impl in ("dpa", "einsum", "einsumT", "pallas"):
        other = KPR(attn_impl=impl, **kw)
        out_d = other.apply(variables, x, p, train=False)
        for key in ("bn_foreg", "bn_parts", "attn", "cls_feat"):
            np.testing.assert_allclose(np.asarray(out_n[key]),
                                       np.asarray(out_d[key]),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"{impl}:{key}")
        e_d, v_d = extract_test_embeddings(out_d)
        np.testing.assert_allclose(np.asarray(e_n), np.asarray(e_d),
                                   rtol=1e-5, atol=1e-5, err_msg=impl)
        np.testing.assert_array_equal(np.asarray(v_n), np.asarray(v_d))


def test_token_pad_output_identical():
    """token_pad pads the sequence to an MXU-friendly length with
    attention-masked zero tokens; the real-token outputs are identical
    (pad keys get -inf logits so softmax weights are unchanged; pad rows
    only pass through per-token ops and are sliced off) — for BOTH
    attention lowerings."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tracklab_tpu.models.kpr import KPR, extract_test_embeddings

    kw = dict(num_parts=3, dim_reduce_output=32, img_size=(64, 32),
              patch_size=8, stride=8, embed_dim=64, depth=2, num_heads=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 64, 32, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(0, 1, (3, 64, 32, 7)), jnp.float32)
    base = KPR(attn_impl="naive", **kw)  # 1 + 8*4 = 33 tokens
    variables = base.init(jax.random.PRNGKey(0), x, p, train=False)
    out_ref = base.apply(variables, x, p, train=False)
    for impl in ("naive", "dpa", "einsum", "einsumT", "pallas"):
        padded = KPR(attn_impl=impl, token_pad=64, **kw)
        out_p = padded.apply(variables, x, p, train=False)
        for key in ("bn_foreg", "bn_parts", "attn", "cls_feat"):
            np.testing.assert_allclose(
                np.asarray(out_ref[key]), np.asarray(out_p[key]),
                rtol=1e-5, atol=1e-5, err_msg=f"{impl}:{key}")
        e_r, v_r = extract_test_embeddings(out_ref)
        e_p, v_p = extract_test_embeddings(out_p)
        np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_p),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(v_r), np.asarray(v_p))


def test_gelu_impls_agree():
    """gelu="erfpoly"/"tanh" are APPROXIMATE lowerings (the exact-erf
    VPU transcendental dominated the in-stack ViT cost on TPU —
    BASELINE.md r5). erfpoly uses an |err|<1.5e-7 minimax erf, below
    bf16 resolution; tanh is the standard GELU approximation (~1e-3).
    Pin both: erfpoly must track the exact path to f32-accumulation
    noise through the full model; tanh to its looser documented bound.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tracklab_tpu.models.kpr import KPR, extract_test_embeddings

    kw = dict(num_parts=3, dim_reduce_output=32, img_size=(64, 32),
              patch_size=8, stride=8, embed_dim=64, depth=2, num_heads=4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 64, 32, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(0, 1, (3, 64, 32, 7)), jnp.float32)
    exact = KPR(gelu="erf", **kw)
    variables = exact.init(jax.random.PRNGKey(0), x, p, train=False)
    out_ref = exact.apply(variables, x, p, train=False)
    e_r, _ = extract_test_embeddings(out_ref)
    for impl, tol in (("erfpoly", 1e-4), ("tanh", 5e-2)):
        approx = KPR(gelu=impl, **kw)
        out_a = approx.apply(variables, x, p, train=False)
        for key in ("bn_foreg", "bn_parts", "attn", "cls_feat"):
            np.testing.assert_allclose(
                np.asarray(out_ref[key]), np.asarray(out_a[key]),
                rtol=tol, atol=tol, err_msg=f"{impl}:{key}")
        e_a, _ = extract_test_embeddings(out_a)
        np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_a),
                                   rtol=tol, atol=tol, err_msg=impl)
