"""Neural models in Flax (detectors, pose, ReID) — the JAX ports replacing
the reference's torch/ONNX model zoo (SURVEY §2.6)."""
