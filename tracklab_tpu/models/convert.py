"""Model weight IO: orbax checkpoints + torch YOLOX checkpoint conversion.

The reference downloads torch/.pth weights per wrapper (SURVEY §5
checkpoint-2); here those same files convert into the Flax YOLOX via a
name-mapping pass (torch NCHW conv -> flax HWIO kernel, BN param/buffer
split), so users of the reference's model zoo keep their weights.
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["save_checkpoint", "load_checkpoint", "convert_yolox_torch",
           "convert_by_name", "convert_osnet_torch"]


def save_checkpoint(path, variables):
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables)
    ckptr.wait_until_finished()


def load_checkpoint(path, model=None, input_shape=None):
    """Load a checkpoint. ``.pth``/``.pt`` files are torch YOLOX
    checkpoints (converted on the fly, requires model+input_shape);
    anything else is an orbax directory."""
    path = Path(path)
    if path.suffix in (".pth", ".pt"):
        assert model is not None and input_shape is not None
        return convert_yolox_torch(path, model, input_shape)
    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if model is not None and input_shape is not None:
        import jax.numpy as jnp
        target = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros(input_shape), train=False))
        return ckptr.restore(path.absolute(), target)
    return ckptr.restore(path.absolute())


def _torch_state_dict(path, allow_pickle=False):
    """Load a torch checkpoint's tensors. Tries the safe weights-only
    loader first; full unpickling (arbitrary code execution on untrusted
    files) requires the explicit ``allow_pickle=True`` opt-in."""
    import torch
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise ValueError(
                f"{path} is not loadable with weights_only=True; pass "
                "allow_pickle=True only for checkpoints you trust")
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model", "state_dict", "ema"):
            if key in ckpt and hasattr(ckpt[key], "items"):
                ckpt = ckpt[key]
                break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items()}


def convert_yolox_torch(path, model, input_shape):
    """Convert an official-layout YOLOX torch checkpoint into this repo's
    Flax YOLOX variables by aligned traversal: both models enumerate their
    conv/BN tensors in the same architectural order, so we zip the torch
    tensors onto the flax leaves after layout transposition, verifying
    every shape."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    sd = _torch_state_dict(path)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(input_shape), train=False)
    flat = flatten_dict(variables, sep="/")
    # flax flatten orders module names lexicographically ("…_10" < "…_2");
    # restore numeric module order so the aligned traversal matches the
    # torch state dict's definition order
    import re

    def natural(key):
        return [int(p) if p.isdigit() else p
                for p in re.split(r"(\d+)", key)]

    flat = dict(sorted(flat.items(), key=lambda kv: natural(kv[0])))

    # torch tensors in module order, filtered to learnables + BN buffers
    torch_items = [(k, v) for k, v in sd.items()
                   if not k.endswith("num_batches_tracked")]

    def torch_order_key(i):
        return i  # insertion order of the state dict == module order

    # group flax leaves by module path so conv kernel/bias and BN
    # scale/bias/mean/var stay together, in creation order
    conv_kernels = [k for k in flat if k.endswith("kernel")]
    log.info("convert: %d torch tensors -> %d flax conv kernels (+BN)",
             len(torch_items), len(conv_kernels))

    # Build aligned queues per tensor kind
    t_convs = [(k, v) for k, v in torch_items if v.ndim == 4]
    t_conv_bias = [(k, v) for k, v in torch_items
                   if v.ndim == 1 and (k.endswith("conv.bias")
                                       or ".weight" not in k
                                       and k.endswith("bias")
                                       and "bn" not in k)]
    new_flat = dict(flat)
    fk_convs = [k for k in flat
                if k.endswith("kernel") and flat[k].ndim == 4]
    if len(t_convs) != len(fk_convs):
        raise ValueError(
            f"conv count mismatch: torch {len(t_convs)} vs flax "
            f"{len(fk_convs)} — wrong variant/num_classes?")
    for (tk, tv), fk in zip(t_convs, fk_convs):
        w = np.transpose(tv, (2, 3, 1, 0))  # OIHW -> HWIO
        if w.shape != flat[fk].shape:
            # depthwise: torch (O, 1, H, W) vs flax (H, W, 1, O)
            if w.shape[:2] == flat[fk].shape[:2] and \
                    w.shape[2] == flat[fk].shape[3] and \
                    flat[fk].shape[2] == 1:
                w = np.transpose(w, (0, 1, 3, 2))
            else:
                raise ValueError(
                    f"shape mismatch {tk}{tv.shape} -> {fk}"
                    f"{flat[fk].shape}")
        new_flat[fk] = jnp.asarray(w)

    # BN: torch (weight, bias, running_mean, running_var) per bn module
    t_bn = {}
    for k, v in torch_items:
        for suffix, name in (("bn.weight", "scale"), ("bn.bias", "bias"),
                             ("bn.running_mean", "mean"),
                             ("bn.running_var", "var")):
            if k.endswith(suffix):
                t_bn.setdefault(k[: -len(suffix)], {})[name] = v
    bn_modules = list(t_bn.values())
    f_bn_scales = [k for k in flat
                   if "BatchNorm" in k and k.endswith("scale")]
    if len(bn_modules) != len(f_bn_scales):
        raise ValueError(
            f"BN count mismatch: torch {len(bn_modules)} vs flax "
            f"{len(f_bn_scales)}")
    for bn, fk_scale in zip(bn_modules, f_bn_scales):
        base = fk_scale[: -len("scale")]
        new_flat[fk_scale] = jnp.asarray(bn["scale"])
        new_flat[base + "bias"] = jnp.asarray(bn["bias"])
        stats_base = base.replace("params/", "batch_stats/")
        if stats_base + "mean" in new_flat:
            new_flat[stats_base + "mean"] = jnp.asarray(bn["mean"])
            new_flat[stats_base + "var"] = jnp.asarray(bn["var"])

    # head conv biases (cls/reg/obj 1x1 convs have biases in both)
    t_head_bias = [(k, v) for k, v in torch_items
                   if v.ndim == 1 and k.endswith(".bias")
                   and k[:-5] + ".weight" in sd
                   and sd[k[:-5] + ".weight"].ndim == 4]
    f_conv_bias = [k for k in flat
                   if k.endswith("bias") and "BatchNorm" not in k
                   and flat[k].ndim == 1]
    if len(t_head_bias) != len(f_conv_bias):
        raise ValueError(
            f"conv-bias count mismatch: torch has {len(t_head_bias)} "
            f"biased convs, flax has {len(f_conv_bias)}")
    for (tk, tv), fk in zip(t_head_bias, f_conv_bias):
        if tv.shape != flat[fk].shape:
            raise ValueError(
                f"conv-bias shape mismatch at {tk} -> {fk}: "
                f"{tv.shape} vs {flat[fk].shape}")
        new_flat[fk] = jnp.asarray(tv)

    return unflatten_dict(new_flat, sep="/")


def export_torch_state_dict(model, variables, input_shape=None):
    """Inverse of :func:`convert_yolox_torch`: emit an official-layout
    torch-style state dict (OIHW convs, conv biases adjacent to their
    weights, BN weight/bias/running_mean/running_var groups) from Flax
    variables. Useful to hand weights back to reference-side tooling,
    and it gives the converter a round-trip parity harness without
    official checkpoint downloads."""
    import re
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(variables, sep="/")

    def natural(key):
        return [int(p) if p.isdigit() else p
                for p in re.split(r"(\d+)", key)]

    flat = dict(sorted(flat.items(), key=lambda kv: natural(kv[0])))
    sd = {}
    i = 0
    for k, v in flat.items():
        if not k.startswith("params/"):
            continue
        if k.endswith("kernel") and v.ndim == 4:
            # HWIO -> OIHW; also maps depthwise (H, W, 1, O) -> (O, 1, H, W)
            sd[f"m{i}.conv.weight"] = np.transpose(np.asarray(v),
                                                   (3, 2, 0, 1))
            bias_key = k[: -len("kernel")] + "bias"
            if bias_key in flat and flat[bias_key].ndim == 1:
                sd[f"m{i}.conv.bias"] = np.asarray(flat[bias_key])
            i += 1
        elif "BatchNorm" in k and k.endswith("scale"):
            base = k[: -len("scale")]
            stats = base.replace("params/", "batch_stats/")
            sd[f"m{i}.bn.weight"] = np.asarray(v)
            sd[f"m{i}.bn.bias"] = np.asarray(flat[base + "bias"])
            sd[f"m{i}.bn.running_mean"] = np.asarray(flat[stats + "mean"])
            sd[f"m{i}.bn.running_var"] = np.asarray(flat[stats + "var"])
            i += 1
    return sd


# ---------------------------------------------------------------------------
# Name-mapped conversion (the robust scheme: every flax module is named to
# mirror its torch state-dict key, so conversion is a pure tensor relayout
# with full shape verification — no enumeration-order alignment)
# ---------------------------------------------------------------------------

_LEAF_MAP = {"kernel": "weight", "scale": "weight", "bias": "bias",
             "mean": "running_mean", "var": "running_var"}


def _relayout(torch_arr, flax_leaf, torch_key):
    """torch tensor layout -> flax layout for one parameter."""
    t = np.asarray(torch_arr)
    if flax_leaf.ndim == 4 and t.ndim == 4:
        # conv OIHW -> HWIO; depthwise (C,1,kh,kw) -> (kh,kw,1,C) is the
        # same permutation
        t = t.transpose(2, 3, 1, 0)
    elif flax_leaf.ndim == 2 and t.ndim == 2:
        t = t.T  # Dense (out,in) -> (in,out)
    elif flax_leaf.ndim == 4 and t.ndim == 1:
        t = t.reshape(flax_leaf.shape)
    if t.shape != flax_leaf.shape:
        raise ValueError(
            f"shape mismatch for {torch_key}: torch {np.asarray(torch_arr).shape} "
            f"-> {t.shape}, flax expects {flax_leaf.shape}")
    return t


def convert_by_name(sd, model, input_shape, torch_key_fn,
                    expected_unused=()):
    """Convert a torch state dict into flax variables by NAME mapping.

    ``torch_key_fn(path_tuple)`` maps a flax flat path (e.g.
    ``('params', 'conv1', 'conv', 'kernel')``) to its torch key, or None
    for first-party parameters with no torch counterpart (kept at init).
    Raises on any missing torch key or shape mismatch; unused torch keys
    must match one of the ``expected_unused`` prefixes.
    """
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(input_shape, jnp.float32),
                           train=False)
    flat = flatten_dict(variables)
    new_flat = {}
    used = set()
    missing = []
    for path, leaf in flat.items():
        tk = torch_key_fn(path)
        if tk is None:
            new_flat[path] = leaf
            continue
        if tk not in sd:
            missing.append(f"{'/'.join(path)} -> {tk}")
            continue
        new_flat[path] = jnp.asarray(_relayout(sd[tk], leaf, tk))
        used.add(tk)
    if missing:
        raise ValueError(
            f"{len(missing)} flax parameters have no torch tensor:\n  "
            + "\n  ".join(missing[:20]))
    unused = [k for k in sd
              if k not in used and not k.endswith("num_batches_tracked")
              and not any(k.startswith(p) for p in expected_unused)]
    if unused:
        raise ValueError(
            f"{len(unused)} torch tensors were not consumed (wrong "
            f"architecture/variant?):\n  " + "\n  ".join(unused[:20]))
    return unflatten_dict(new_flat)


def _osnet_torch_key(path):
    """Flax path -> torchreid OSNet state-dict key
    (reference plugins/track/strong_sort/deep/models/osnet.py). Flax
    module names mirror the torch attribute path with '.' spelled '__'
    (e.g. conv2__0/conv2b__1/conv1/kernel -> conv2.0.conv2b.1.conv1.weight)."""
    _, *mods, leaf = path
    if mods and mods[0] == "part_fc":
        return None  # first-party part head, no official weights
    comps = []
    for m in mods:
        comps.extend(m.split("__"))
    return ".".join(comps + [_LEAF_MAP[leaf]])


def convert_osnet_torch(sd_or_path, model, input_shape,
                        allow_pickle=False):
    """Convert a torchreid OSNet checkpoint (osnet_x1_0 family, incl. the
    ibn variant) into this repo's Flax OSNet variables. Activation parity
    vs the vendored torch model: tests/test_weight_parity.py."""
    sd = (sd_or_path if isinstance(sd_or_path, dict)
          else _torch_state_dict(sd_or_path, allow_pickle=allow_pickle))
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    return convert_by_name(sd, model, input_shape, _osnet_torch_key,
                           expected_unused=("classifier.",))
