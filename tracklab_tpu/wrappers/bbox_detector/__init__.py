from tracklab_tpu.wrappers.bbox_detector.yolox_api import YOLOXDetector  # noqa
