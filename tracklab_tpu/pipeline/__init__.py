from tracklab_tpu.pipeline.module import Module, Pipeline, Skip  # noqa
from tracklab_tpu.pipeline.levels import (  # noqa
    ImageLevelModule, DetectionLevelModule, VideoLevelModule, Evaluator,
)
