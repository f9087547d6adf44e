"""KPR — Keypoint Promptable Re-Identification (part-based ReID).

The reference's flagship ReID module builds the KPR model from the
authors' torchreid fork (tracklab/wrappers/reid/kpreid_api.py:21-186:
``build_model(self.cfg, ...)``, prompt masks from ``KeypointsToMasks``
at :76-80, test-time selection via ``extract_test_embeddings`` at
:154-161). The fork itself is not vendored in the reference repo, so
this is a from-scratch TPU-native implementation of the published
architecture (Somers et al., "Keypoint Promptable Re-Identification",
ECCV 2024 — a promptable TransReID-style ViT feeding the BPBReID
part-attention head):

* **Promptable ViT backbone** (`PromptableViT`): patch-embedding conv,
  plus a *dedicated zero-initialized prompt-embedding conv* over the
  keypoint prompt-mask channels whose output is added token-wise to the
  patch embeddings (SAM-style dense prompting — with no prompt the
  backbone is exactly a standard ViT). Class token + learned positional
  embeddings, pre-norm transformer blocks, final LayerNorm. Optional
  TransReID SIE camera embedding (cfg ``transreid.sie_camera``, off in
  the reference config kpr.yaml).
* **Part-attention head** (BPBReID semantics, reference config
  bpbreid.yaml: pooling=gwap, dim_reduce=after_pooling,
  dim_reduce_output, test_embeddings=['bn_foreg','parts']): a pixel
  (=patch-token) classifier produces K+1 attention maps (background +
  K parts, K=5 for the 'five_v' vertical-part grouping); features are
  pooled by global-weighted-average-pooling per part, dim-reduced, and
  batch-normed; per-part visibility scores are the attention maxima.

``extract_test_embeddings`` stacks the configured embedding branches
into the (N, 1+K, D) ``embeddings`` + (N, 1+K) ``visibility_scores``
arrays that the BPBReID-StrongSORT tracker consumes (part-based
distance, trackers/bpbreid_sort semantics).

Weight conversion: models/convert.convert_kpr_torch maps a torch state
dict onto these modules by name (tests/test_kpr_parity.py drives an
independently-written torch oracle through it and checks activation
parity). The fork's exact checkpoint naming could not be verified
in-container (package absent); the converter's alias table +
tests/test_checkpoint_manifests.py record the expected key set so a
real ``kpr_*.pth.tar`` dropped under cache/ is validated end-to-end.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["KPR", "PromptableViT", "extract_test_embeddings",
           "PROMPT_GROUPS_CCK6", "PART_GROUPS_FIVE_V",
           "gaussian_prompt_maps"]

# COCO-17 keypoints -> 6 coarse prompt channels (the fork's
# ``prompt_preprocess: cck6`` grouping — head / torso / left arm /
# right arm / left leg / right leg); a 7th channel carries negative
# (other-person) keypoints when provided.
PROMPT_GROUPS_CCK6: Sequence[Sequence[int]] = (
    (0, 1, 2, 3, 4),        # nose, eyes, ears
    (5, 6, 11, 12),         # shoulders + hips (torso)
    (5, 7, 9),              # left arm
    (6, 8, 10),             # right arm
    (11, 13, 15),           # left leg
    (12, 14, 16),           # right leg
)

# COCO-17 keypoints -> 5 vertical body parts (the fork's
# ``masks.preprocess: five_v`` part structure: head, torso, arms,
# legs, feet) — K=5 target parts for the pixel classifier.
PART_GROUPS_FIVE_V: Sequence[Sequence[int]] = (
    (0, 1, 2, 3, 4),
    (5, 6, 11, 12),
    (7, 8, 9, 10),
    (13, 14),
    (15, 16),
)


def _gelu_erfpoly(x):
    """GELU via an Abramowitz–Stegun 7.1.26 minimax erf (|err| < 1.5e-7
    in f32 — below bf16 resolution: ≤1 bf16 ulp vs the exact lowering on
    ~6% of values, bit-equal on the rest; see BASELINE.md).

    Exists because XLA:TPU's exact-``erf`` lowering dominates the ViT
    MLP cost in-stack (the VPU transcendental blocks fusion): the
    12-layer 384-crop stack measured 312 ms with exact erf vs 180 ms
    with this polynomial — GELU, not attention, was the KPR hot spot.
    """
    xf = x.astype(jnp.float32)
    z = xf * 0.70710678
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(z))
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
                - 0.284496736) * t + 0.254829592) * t * jnp.exp(-z * z)
    return (xf * 0.5 * (1.0 + jnp.sign(z) * y)).astype(x.dtype)


_GELU_IMPLS = {
    "erf": lambda x: nn.gelu(x, approximate=False),
    "tanh": lambda x: nn.gelu(x, approximate=True),
    "erfpoly": _gelu_erfpoly,
}


class _Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32
    gelu: str = "erf"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = _GELU_IMPLS[self.gelu](x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class _Attention(nn.Module):
    """Multi-head self-attention with selectable lowering:

    * ``naive`` — explicit (B, H, N, N) logits + softmax in the compute
      dtype (the textbook path; reference semantics).
    * ``dpa`` — :func:`jax.nn.dot_product_attention` (XLA fused path,
      no head transposes, softmax upcast to f32 internally). Same math:
      agrees with ``naive`` to ~4e-7 in f32; in bf16 it is strictly
      CLOSER to the f32 reference (the f32 softmax), so checkpoint
      parity is preserved. Which is faster on TPU is workload-dependent
      (the f32 logits cost HBM); BASELINE.md records the A/B.
    """
    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    impl: str = "naive"
    n_valid: int | None = None   # static real-token count (pallas mask)

    @nn.compact
    def __call__(self, x, key_valid=None):
        B, N, D = x.shape
        H = self.num_heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D // H)
        if self.impl == "pallas":
            from tracklab_tpu.ops.vit_attention_pallas import vit_attention
            y = vit_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                              n_valid=self.n_valid)
            y = y.reshape(B, N, D)
        elif self.impl in ("einsum", "einsumT"):
            # Transpose-free lowerings (r5 device trace: the naive
            # path's explicit head transposes are ~35 ms/call of `copy`
            # ops at B=384). einsumT additionally puts the KEY axis on
            # sublanes so the softmax reduction is not a cross-lane
            # shuffle (the trace's 63 ms of convert_reduce_fusion).
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scale = (D // H) ** -0.5
            if self.impl == "einsum":
                attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
                if key_valid is not None:
                    attn = jnp.where(key_valid[None, None, None, :],
                                     attn, jnp.finfo(attn.dtype).min)
                attn = nn.softmax(attn, axis=-1)
                y = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
            else:
                attn = jnp.einsum("bmhd,bnhd->bhmn", k, q) * scale
                if key_valid is not None:
                    attn = jnp.where(key_valid[None, None, :, None],
                                     attn, jnp.finfo(attn.dtype).min)
                attn = nn.softmax(attn, axis=-2)
                y = jnp.einsum("bhmn,bmhd->bnhd", attn, v)
            y = y.reshape(B, N, D)
        elif self.impl == "dpa":
            mask = (None if key_valid is None
                    else key_valid[None, None, None, :])
            y = jax.nn.dot_product_attention(
                qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                mask=mask)  # (B, N, H, Dh)
            y = y.reshape(B, N, D)
        else:
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3)
                       for i in range(3))
            attn = (q @ k.transpose(0, 1, 3, 2)) * ((D // H) ** -0.5)
            if key_valid is not None:
                attn = jnp.where(key_valid[None, None, None, :], attn,
                                 jnp.finfo(attn.dtype).min)
            attn = nn.softmax(attn, axis=-1)
            y = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(y)


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    attn_impl: str = "naive"
    gelu: str = "erf"
    n_valid: int | None = None

    @nn.compact
    def __call__(self, x, key_valid=None):
        x = x + _Attention(self.dim, self.num_heads, self.dtype,
                           impl=self.attn_impl, n_valid=self.n_valid,
                           name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x), key_valid)
        x = x + _Mlp(int(self.dim * self.mlp_ratio), self.dim,
                     self.dtype, gelu=self.gelu, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        return x


class PromptableViT(nn.Module):
    """TransReID-style ViT with SAM-style dense keypoint prompting.

    Input NHWC images (already normalized) + optional prompt masks
    (B, H, W, P). Returns ``(cls_feat (B, D), spatial (B, Hp, Wp, D))``.
    The prompt conv is zero-initialized: an absent / all-zero prompt
    reproduces the unprompted backbone exactly (the fork's
    ``promptable_trans.masks_prompting`` off switch is then a no-op on
    weights, kpr.yaml).
    """
    img_size: tuple = (384, 128)
    patch_size: int = 16
    stride: int = 16          # TransReID overlapping embeds use 12
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    n_prompt_ch: int = 7      # cck6 groups + negative-keypoint channel
    n_cameras: int = 0        # >0 enables the SIE camera embedding
    dtype: Any = jnp.float32
    attn_impl: str = "naive"  # "naive" | "dpa" | "einsum" | "einsumT"
    #   | "pallas"; einsum* are transpose-free dot_general lowerings
    #   (einsumT also reduces softmax over sublanes), pallas is the
    #   fused VMEM kernel (ops/vit_attention_pallas) — all A/B'd on
    #   chip in BASELINE.md r5
    gelu: str = "erf"         # "erf" (exact) | "erfpoly" | "tanh"
    token_pad: int = 0        # pad sequence to this length (0 = off):
    #   TPU MXU/VPU tiles are 128-lane; 1+24*8=193 tokens is an awkward
    #   length. Padding to e.g. 256 with attention-masked zero tokens is
    #   OUTPUT-IDENTICAL for the real tokens (pad keys get -inf logits;
    #   pad rows are per-token ops, sliced off before the heads) —
    #   exactness test: tests/test_kpr.py. A/B on chip via BASELINE.md.

    @property
    def grid(self):
        h, w = self.img_size
        p, s = self.patch_size, self.stride
        return ((h - p) // s + 1, (w - p) // s + 1)

    @nn.compact
    def __call__(self, x, prompts=None, cam_id=None):
        B = x.shape[0]
        gh, gw = self.grid
        p, s = self.patch_size, self.stride
        tokens = nn.Conv(self.embed_dim, (p, p), strides=(s, s),
                         padding="VALID", dtype=self.dtype,
                         name="patch_embed__proj")(x)
        tokens = tokens.reshape(B, gh * gw, self.embed_dim)
        if prompts is not None:
            pe = nn.Conv(self.embed_dim, (p, p), strides=(s, s),
                         padding="VALID", dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         name="prompt_embed__proj")(
                prompts.astype(x.dtype))
            tokens = tokens + pe.reshape(B, gh * gw, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, 1 + gh * gw, self.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(
                tokens.dtype), tokens], axis=1)
        x = x + pos.astype(x.dtype)
        if self.n_cameras:
            sie = self.param("sie_embed", nn.initializers.zeros,
                             (self.n_cameras, 1, self.embed_dim))
            cid = (jnp.zeros(B, jnp.int32) if cam_id is None
                   else cam_id.astype(jnp.int32))
            x = x + sie[cid].astype(x.dtype)
        n_real = 1 + gh * gw
        key_valid = None
        if self.token_pad and self.token_pad > n_real:
            x = jnp.pad(x, ((0, 0), (0, self.token_pad - n_real), (0, 0)))
            key_valid = jnp.arange(self.token_pad) < n_real
        n_valid = n_real if key_valid is not None else None
        for i in range(self.depth):
            x = _Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                       self.dtype, attn_impl=self.attn_impl,
                       gelu=self.gelu, n_valid=n_valid,
                       name=f"blocks__{i}")(x, key_valid)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        cls_feat = x[:, 0]
        spatial = x[:, 1:n_real].reshape(B, gh, gw, self.embed_dim)
        return cls_feat, spatial


def _gwap(feat, attn):
    """Global weighted average pooling: (B,H,W,D) x (B,H,W) -> (B,D)."""
    w = attn[..., None]
    return (feat * w).sum((1, 2)) / (w.sum((1, 2)) + 1e-6)


class KPR(nn.Module):
    """Full KPR model: promptable backbone + BPBReID part head.

    ``__call__(images, prompt_masks=None, cam_id=None, train=False)``
    returns the embedding-branch dict (see module docstring); feed it to
    :func:`extract_test_embeddings` for the tracker-facing arrays.
    Images are NHWC, already normalized; prompt masks (B, H, W, P).
    """
    num_parts: int = 5                  # 'five_v' part structure
    dim_reduce_output: int = 512        # kpr.yaml dim_reduce_output
    img_size: tuple = (384, 128)        # bpbreid.yaml data.height/width
    patch_size: int = 16
    stride: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    n_prompt_ch: int = 7
    n_cameras: int = 0
    dtype: Any = jnp.float32
    attn_impl: str = "naive"
    gelu: str = "erf"
    token_pad: int = 0

    def dummy_input_shapes(self, input_shape):
        """Init-time positional input shapes (convert.init_inputs hook):
        prompt masks gate the dense prompt-embedding parameters, so
        init must always pass them."""
        h, w = self.img_size
        return ((1, h, w, 3), (1, h, w, self.n_prompt_ch))

    @nn.compact
    def __call__(self, images, prompt_masks=None, cam_id=None,
                 train: bool = False):
        K = self.num_parts
        backbone = PromptableViT(
            img_size=self.img_size, patch_size=self.patch_size,
            stride=self.stride, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            n_prompt_ch=self.n_prompt_ch, n_cameras=self.n_cameras,
            dtype=self.dtype, attn_impl=self.attn_impl,
            gelu=self.gelu, token_pad=self.token_pad, name="backbone")
        cls_feat, spat = backbone(images, prompt_masks, cam_id)
        B, gh, gw, D = spat.shape

        # pixel-to-part classifier over patch tokens: K+1 maps
        # (channel 0 = background), softmax across channels
        logits = nn.Dense(K + 1, dtype=self.dtype,
                          name="pixel_classifier")(spat)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1)

        globl = spat.mean((1, 2))                       # GAP
        foreg = _gwap(spat, 1.0 - attn[..., 0])          # foreground
        parts = jnp.stack([_gwap(spat, attn[..., 1 + k])
                           for k in range(K)], axis=1)   # (B, K, D)
        conct = parts.reshape(B, K * D)

        # after-pooling dim reduction (one Dense per branch; the parts
        # branch shares its projection across parts)
        red = self.dim_reduce_output
        globl = nn.Dense(red, dtype=self.dtype,
                         name="dim_reduce_global")(globl)
        foreg = nn.Dense(red, dtype=self.dtype,
                         name="dim_reduce_foreground")(foreg)
        conct = nn.Dense(red, dtype=self.dtype,
                         name="dim_reduce_concat_parts")(conct)
        parts = nn.Dense(red, dtype=self.dtype,
                         name="dim_reduce_parts")(parts)

        def bn(x, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)(x)

        out = {
            "globl": globl, "foreg": foreg, "conct": conct,
            "parts": parts,
            "bn_globl": bn(globl, "bn_global"),
            "bn_foreg": bn(foreg, "bn_foreground"),
            "bn_conct": bn(conct, "bn_concat_parts"),
            "bn_parts": bn(parts, "bn_parts"),
            "pixels_cls_scores": logits,
            "attn": attn,
            "cls_feat": cls_feat,
            "visibility": {
                "globl": jnp.ones((B,), jnp.float32),
                "foreg": jnp.max(1.0 - attn[..., 0], axis=(1, 2)),
                "conct": jnp.ones((B,), jnp.float32),
                "parts": jnp.max(attn[..., 1:], axis=(1, 2)),  # (B, K)
            },
        }
        return out


def gaussian_prompt_maps(keypoints_xyc, bbox_ltrb, crop_hw,
                         vis_thresh: float = 0.3,
                         sigma_frac: float = 0.08,
                         negative_kps=None):
    """Device counterpart of the host prompt rasterizer
    (wrappers/reid/reid_dataset.gaussian_keypoint_masks +
    kpr_api.KPReId._prompt_masks): keypoints + their detection box ->
    cck6 gaussian prompt channels, batched.

    Prompt coordinates are crop-relative ((kp - box_lt) / box_wh), so
    keypoints and boxes may be in ANY common frame (original, work, or
    letterboxed) — the maps are identical.

    Args:
      keypoints_xyc: (..., K, 3) with K >= 17 (COCO order).
      bbox_ltrb: (..., 4) the keypoints' detection boxes, same frame.
      crop_hw: static (h, w) of the model input crop.
      negative_kps: optional (..., Kn, 3) other-person keypoints for the
        trailing channel (zero when None).

    Returns (..., h, w, G + 1) float32 prompt maps.
    """
    h, w = crop_hw
    kp = keypoints_xyc.astype(jnp.float32)
    box = bbox_ltrb.astype(jnp.float32)
    bw = jnp.maximum(box[..., 2] - box[..., 0], 1e-6)
    bh = jnp.maximum(box[..., 3] - box[..., 1], 1e-6)
    sigma = sigma_frac * max(h, w)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def kp_mask(k_idx, source, conf_gate):
        x = (source[..., k_idx, 0] - box[..., 0]) / bw * w
        y = (source[..., k_idx, 1] - box[..., 1]) / bh * h
        c = source[..., k_idx, 2]
        d2 = ((xs - x[..., None, None]) ** 2
              + (ys - y[..., None, None]) ** 2)
        m = jnp.exp(-d2 / (2.0 * sigma ** 2))
        keep = (c > 0) if conf_gate is None else \
            ((c > 0) & (c >= conf_gate))
        return m * keep[..., None, None]

    zero = jnp.zeros(kp.shape[:-2] + (h, w), jnp.float32)
    channels = []
    K = kp.shape[-2]
    for group in PROMPT_GROUPS_CCK6:
        g = zero
        for k_idx in group:
            if k_idx < K:
                g = jnp.maximum(g, kp_mask(k_idx, kp, vis_thresh))
        channels.append(g)
    neg = zero
    if negative_kps is not None:
        for k_idx in range(negative_kps.shape[-2]):
            neg = jnp.maximum(neg, kp_mask(k_idx, negative_kps, None))
    channels.append(neg)
    return jnp.stack(channels, axis=-1)


def extract_test_embeddings(out, test_embeddings=("bn_foreg", "parts"),
                            binary_visibility: bool = True):
    """Stack the configured branches into tracker-facing arrays.

    Mirrors the fork call in the reference wrapper
    (kpreid_api.py:154-161): returns ``embeddings (B, P, D)`` and
    ``visibility_scores (B, P)`` where P is the total part count of the
    selected branches (1 for scalar branches, K for 'parts'/'bn_parts').
    ``binary_visibility`` reproduces
    ``testing_binary_visibility_score: True`` (bpbreid.yaml): scores
    threshold at 0.5 into {0,1}.
    """
    embs, viss = [], []
    for name in test_embeddings:
        e = out[name]
        base = name[3:] if name.startswith("bn_") else name
        v = out["visibility"][base]
        if e.ndim == 2:
            e = e[:, None, :]
            v = v[:, None]
        embs.append(e)
        viss.append(v)
    emb = jnp.concatenate(embs, axis=1)
    vis = jnp.concatenate(viss, axis=1)
    if binary_visibility:
        vis = (vis > 0.5).astype(jnp.float32)
    return emb, vis
