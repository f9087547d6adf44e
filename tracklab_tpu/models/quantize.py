"""Post-training int8 quantization for the conv pipeline (PTQ).

BASELINE.md's r3 roofline puts YOLOX-s at ~91% of its serial
bf16 roofline (HBM 69 ms vs MXU 51 ms per bs=384 batch) — the remaining
levers are compute/bandwidth overlap or a cheaper number format. int8
attacks both terms at once on TPU: the MXU runs s8xs8->s32 at 2x the
bf16 rate (v5e: 394 vs 197 TOPS), and int8 inter-layer activations halve
the dominant HBM term again (XLA fuses the requantize chain into the
producing conv's epilogue).

Scheme (symmetric, zero-point 0 — TPU convs pad with zeros, so the
quantized padding is exact):

  * weights: per-output-channel scale, quantized ON THE FLY inside the
    jitted forward from the ordinary f32 ``params`` (9M weights of
    elementwise work per forward is noise next to 6.7 TFLOP of conv;
    checkpoints stay the standard layout and every converter keeps
    working).
  * activations: per-conv-input scalar scale, CALIBRATED offline: the
    ``quant="calib"`` model forward sows each conv input's absmax into
    the ``qstats`` collection; :func:`calibrate_int8` reduces absmax
    over calibration batches and stores ``ascale = absmax / 127`` in the
    ``quant`` variable collection that the ``quant="int8"`` forward
    reads.
  * conv: s8 x s8 -> s32 (``preferred_element_type``), dequantized by
    ``ascale * wscale[c]`` into f32; BatchNorm + silu stay f32 exactly as
    the bf16 path; grouped/depthwise convs and the tiny head prediction
    convs stay in the compute dtype (negligible FLOPs, poor int8
    lowering).

The reference has no quantization story (its detectors run fp16/fp32
through torch/onnxruntime, tracklab/wrappers/bbox_detector/*); this is a
TPU-first extension, opt-in via ``YOLOX(quant="int8")`` or the detector
wrapper's ``quant`` argument.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["quant_conv_int8", "sow_absmax", "calibrate_int8",
           "quant_error_report"]


def sow_absmax(module, x):
    """Record the absmax of a conv input under qstats/<path>/absmax
    (reduced with max across multiple calls in one forward)."""
    module.sow("qstats", "absmax",
               jnp.max(jnp.abs(x.astype(jnp.float32))),
               init_fn=lambda: jnp.zeros((), jnp.float32),
               reduce_fn=jnp.maximum)


def ascale_variable(module):
    """The calibrated input scale read by the int8 forward (filled in by
    :func:`calibrate_int8`; the init value 1.0 only exists so
    ``model.init`` produces the right tree)."""
    return module.variable("quant", "ascale",
                           lambda: jnp.ones((), jnp.float32)).value


def quant_conv_int8(x, kernel, ascale, strides, padding):
    """s8 x s8 -> s32 convolution with on-the-fly weight quantization.

    x: (B, H, W, C) activations (any float dtype); kernel: (kh, kw, C, F)
    f32 params; ascale: scalar input scale. Returns f32 dequantized conv
    output (pre-BN).
    """
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                  -127.0, 127.0).astype(jnp.int8)
    wabs = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    wscale = jnp.maximum(wabs / 127.0, 1e-12)
    wq = jnp.round(kernel / wscale).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (ascale * wscale)


def _as_quant_tree(qstats):
    """qstats/<path>/absmax (possibly flax-sow tuples) -> numpy absmax
    leaves keyed by the same path."""
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            v = node[-1] if isinstance(node, (tuple, list)) else node
            flat[path] = np.asarray(v, np.float32)

    walk(qstats, ())
    return flat


def calibrate_int8(model_calib, variables, batches):
    """Run calibration batches through the ``quant="calib"`` model and
    return ``variables`` extended with the ``quant`` collection the
    ``quant="int8"`` model reads.

    ``batches``: iterable of image arrays shaped like the model input.
    absmax is reduced (max) across batches; ascale = absmax / 127 with a
    floor so dead layers don't divide by zero.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    base = {k: v for k, v in variables.items() if k != "quant"}
    acc: dict = {}
    for batch in batches:
        _, state = model_calib.apply(base, jnp.asarray(batch),
                                     train=False, mutable=["qstats"])
        flat = _as_quant_tree(state["qstats"])
        for path, v in flat.items():
            acc[path] = np.maximum(acc.get(path, 0.0), v)
    if not acc:
        raise ValueError("calibration saw no conv inputs — was the "
                         "model built with quant='calib'?")
    quant = {}
    for path, absmax in acc.items():
        assert path[-1] == "absmax", path
        quant[path[:-1] + ("ascale",)] = jnp.asarray(
            max(float(absmax), 1e-6) / 127.0, jnp.float32)
    return {**base, "quant": unflatten_dict(quant)}


def quant_error_report(model_f32, model_int8, variables, qvariables,
                       batch):
    """Relative output error of the int8 model vs the f32 model on one
    batch — a quick PTQ sanity metric (median/max relative delta of the
    decoded predictions)."""
    a = np.asarray(model_f32.apply(variables, jnp.asarray(batch),
                                   method=type(model_f32).predict))
    b = np.asarray(model_int8.apply(qvariables, jnp.asarray(batch),
                                    method=type(model_int8).predict))
    denom = np.maximum(np.abs(a), 1e-3)
    rel = np.abs(a - b) / denom
    return {"median_rel": float(np.median(rel)),
            "p99_rel": float(np.quantile(rel, 0.99)),
            "max_abs": float(np.abs(a - b).max())}
