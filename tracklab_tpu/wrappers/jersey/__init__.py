from tracklab_tpu.wrappers.jersey.ocr_api import JerseyNumberOCR  # noqa
