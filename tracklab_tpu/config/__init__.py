from tracklab_tpu.config.compose import (  # noqa
    compose, instantiate, load_yaml, OmegaDict,
)
