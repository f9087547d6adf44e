from tracklab_tpu.wrappers.reid.osnet_api import OSNetReId  # noqa
