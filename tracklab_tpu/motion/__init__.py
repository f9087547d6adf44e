from tracklab_tpu.motion.gmc import GMC, CameraMotion  # noqa
