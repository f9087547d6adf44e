"""Integration layer: adapts trackers/models/datasets/evaluators to the
Module ABCs (reference: tracklab/wrappers/)."""
