from tracklab_tpu.eval.metrics import (  # noqa
    hota_metrics, clear_metrics, identity_metrics, evaluate_sequence,
    combine_sequences,
)
from tracklab_tpu.eval.evaluator import TrackEvalEvaluator  # noqa
from tracklab_tpu.eval.gs_evaluator import (  # noqa
    GameStateEvaluator, SoccerAccuracy,
)
from tracklab_tpu.eval.pose_evaluator import PoseTrackEvaluator  # noqa
from tracklab_tpu.eval.pose_metrics import (  # noqa
    make_pose_sequence_data, keypoint_map,
)
