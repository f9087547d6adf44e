"""tracklab-tpu: a TPU-native multi-object tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
TrackingLaboratory/tracklab: modular config-driven pipelines for bbox
detection, pose estimation, person re-identification, online/offline
tracking, tracklet attribute aggregation, evaluation (HOTA/MOTA/IDF1) and
visualization — designed TPU-first (fixed-capacity padded state, lax.scan
video loops, on-device association, shard_map video-level parallelism).
"""

__version__ = "0.1.0"
