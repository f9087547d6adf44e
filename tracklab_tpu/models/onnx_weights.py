"""ONNX checkpoint weight extraction — no onnxruntime required.

The reference's rtmlib wrappers run YOLOX/RTMDet/RTMPose from published
.onnx files via ONNXRuntime (tracklab/wrappers/*/rtmlib_api.py:22-43),
and StrongSORT's multibackend loader accepts .onnx ReID weights
(strong_sort/reid_multibackend.py:33+). On TPU the graph executes as
our Flax ports; what we need from the .onnx file is only its WEIGHTS.
This module reads them directly: ONNX is protobuf, and the subset we
need (ModelProto.graph.initializer: TensorProto name/dims/dtype/data)
is parsed here with a ~100-line wire-format reader, so no onnx package
or network is needed.

Exports folded-BatchNorm graphs too: when the exporter fused BN into
conv (the common mmdeploy/rtmlib deployment export), the conv gains a
bias and the BN tensors disappear; ``convert_onnx_folded_bn`` loads
such files into our conv+BN Flax blocks by setting the BN to an EXACT
pass-through (mean 0, var 1, scale sqrt(1+eps), bias = conv bias) so
activations match the folded graph bit-for-bit modulo float rounding.
"""
from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

__all__ = ["parse_onnx_initializers", "convert_onnx_folded_bn"]

# TensorProto.DataType -> numpy dtype
_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16,
           5: np.int16, 6: np.int32, 7: np.int64, 9: np.bool_,
           10: np.float16, 11: np.float64, 12: np.uint32, 13: np.uint64}


def _read_varint(buf, i):
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _to_i64(v):
    """Protobuf int64 varints carry negatives as 10-byte two's-complement
    (e.g. axes=[-1] in a Reshape constant); fold back into signed range."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _fields(buf):
    """Yield (field_number, wire_type, value_bytes_or_int) over a
    protobuf message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _parse_tensor(buf):
    dims = []
    dtype = 1
    name = ""
    raw = None
    f32 = []
    i64 = []
    f64 = []
    for field, wt, v in _fields(buf):
        if field == 1:              # dims (int64, maybe packed)
            if wt == 0:
                dims.append(v)
            else:
                i = 0
                while i < len(v):
                    d, i = _read_varint(v, i)
                    dims.append(d)
        elif field == 2 and wt == 0:
            dtype = v
        elif field == 4:            # float_data
            if wt == 5:
                f32.append(struct.unpack("<f", v)[0])
            else:
                f32.extend(np.frombuffer(v, "<f4").tolist())
        elif field == 7:            # int64_data (two's-complement varints)
            if wt == 0:
                i64.append(_to_i64(v))
            else:
                i = 0
                while i < len(v):
                    d, i = _read_varint(v, i)
                    i64.append(_to_i64(d))
        elif field == 8 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif field == 9 and wt == 2:
            raw = v
        elif field == 11:           # double_data
            if wt == 1:
                f64.append(struct.unpack("<d", v)[0])
            else:
                f64.extend(np.frombuffer(v, "<f8").tolist())
    np_dtype = _DTYPES.get(dtype)
    if np_dtype is None:
        return name, None
    if raw is not None:
        arr = np.frombuffer(raw, np_dtype)
    elif f32:
        arr = np.asarray(f32, np.float32)
    elif f64:
        arr = np.asarray(f64, np.float64)
    elif i64:
        arr = np.asarray(i64, np.int64)
    else:
        arr = np.zeros(0, np_dtype)
    try:
        arr = arr.reshape(dims)
    except ValueError:
        return name, None
    return name, arr


def parse_onnx_initializers(path) -> dict:
    """name -> numpy array for every graph initializer in an .onnx file
    (ModelProto field 7 = graph; GraphProto field 5 = initializer)."""
    buf = Path(path).read_bytes()
    out = {}
    for field, wt, v in _fields(buf):
        if field == 7 and wt == 2:          # ModelProto.graph
            for gf, gwt, gv in _fields(v):
                if gf == 5 and gwt == 2:    # GraphProto.initializer
                    name, arr = _parse_tensor(gv)
                    if arr is not None and name:
                        out[name] = arr
    return out


def convert_onnx_folded_bn(sd_or_path, model, input_shape, torch_key_fn,
                           bn_eps: float = 1e-3,
                           expected_unused=()):
    """Load a folded-BN onnx export into conv+BN Flax variables.

    ``torch_key_fn`` is the family's flax-path -> torch-key map
    (convert.py). For every flax conv kernel whose sibling BN has no
    tensors in the file, the conv's onnx bias (``<conv>.bias``) moves
    into the BN: mean=0, var=1, scale=sqrt(1+eps), bias=b — an exact
    pass-through of ``conv(x) + b``.
    """
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from tracklab_tpu.models.convert import _relayout

    sd = (dict(sd_or_path) if isinstance(sd_or_path, dict)
          else parse_onnx_initializers(sd_or_path))
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
        if tk in sd:
            new_flat[path] = jnp.asarray(_relayout(sd[tk], leaf, tk))
            used.add(tk)
            continue
        # Folded-BN reconstruction for the missing BN tensors. Only
        # applies when the sibling conv's onnx bias exists (folding
        # always produces one: b = beta - mean*gamma/std); a BN leaf
        # with neither its own tensor nor a folded conv bias is a
        # genuine name-map miss and must be reported, never filled.
        leaf_name = path[-1]
        coll = path[0]
        fold_src = {"scale": ".bn.weight", "bias": ".bn.bias",
                    "mean": ".bn.running_mean", "var": ".bn.running_var"}
        suffix = fold_src.get(leaf_name)
        folded_bias = (tk.replace(suffix, ".conv.bias")
                       if suffix and tk.endswith(suffix) else None)
        if folded_bias is None or folded_bias not in sd:
            missing.append(f"{'/'.join(path)} -> {tk}")
        elif coll == "params" and leaf_name == "scale":
            new_flat[path] = jnp.full(leaf.shape,
                                      float(np.sqrt(1.0 + bn_eps)))
        elif coll == "params" and leaf_name == "bias":
            new_flat[path] = jnp.asarray(
                np.asarray(sd[folded_bias]).reshape(leaf.shape))
            used.add(folded_bias)
        elif coll == "batch_stats" and leaf_name == "mean":
            new_flat[path] = jnp.zeros(leaf.shape, leaf.dtype)
        elif coll == "batch_stats" and leaf_name == "var":
            new_flat[path] = jnp.ones(leaf.shape, leaf.dtype)
        else:
            missing.append(f"{'/'.join(path)} -> {tk}")
    if missing:
        raise ValueError(
            f"{len(missing)} flax parameters have no onnx tensor:\n  "
            + "\n  ".join(missing[:20]))
    # Real exports (do_constant_folding=True: mmdeploy, ultralytics,
    # torch.onnx defaults) store Reshape/Resize shape constants and
    # decode grids as extra initializers named after graph ops
    # ("onnx::Reshape_123", "Constant_5", bare numbers) — those are not
    # weights and are fine to skip. Raise only for unconsumed tensors
    # whose names look like state-dict parameters (a missed name-map
    # entry), which IS a load error.
    unused = [k for k in sd if k not in used
              and not any(k.startswith(p) for p in expected_unused)
              and _looks_like_weight(k)]
    if unused:
        raise ValueError(
            f"{len(unused)} onnx weight tensors were not consumed:\n  "
            + "\n  ".join(unused[:20]))
    return unflatten_dict(new_flat)


_WEIGHT_SUFFIXES = (".weight", ".bias", ".running_mean", ".running_var")


def _looks_like_weight(name: str) -> bool:
    return name.endswith(_WEIGHT_SUFFIXES) and not name.startswith("onnx::")
