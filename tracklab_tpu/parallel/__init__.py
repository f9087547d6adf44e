from tracklab_tpu.parallel.mesh import (  # noqa
    make_mesh, shard_params_tp, shard_batch_dp, tracker_videos_sharded,
)
