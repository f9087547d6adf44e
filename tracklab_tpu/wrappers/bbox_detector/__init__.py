from tracklab_tpu.wrappers.bbox_detector.yolox_api import YOLOXDetector  # noqa
from tracklab_tpu.wrappers.bbox_detector.yolov8_api import YOLOv8Detector  # noqa
from tracklab_tpu.wrappers.bbox_detector.rtdetr_api import RTDETRDetector  # noqa
from tracklab_tpu.wrappers.bbox_detector.rtmdet_api import RTMDetDetector  # noqa
