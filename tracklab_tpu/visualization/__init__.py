from tracklab_tpu.visualization.visualizer import (  # noqa
    Visualizer, ImageVisualizer, DetectionVisualizer, track_color,
)
from tracklab_tpu.visualization.detection import (  # noqa
    DefaultDetectionVisualizer, EllipseDetectionVisualizer,
    DebugDetectionVisualizer,
)
from tracklab_tpu.visualization.keypoints import (  # noqa
    KeypointsVisualizer,
)
from tracklab_tpu.visualization.tracking import (  # noqa
    TrackingLineVisualizer,
)
from tracklab_tpu.visualization.image import FrameCounterVisualizer  # noqa
from tracklab_tpu.visualization.visualization_engine import (  # noqa
    VisualizationEngine,
)
from tracklab_tpu.visualization.detection import (  # noqa
    DetectionStatsVisualizer, IgnoreRegionVisualizer,
)
