from tracklab_tpu.calibration.camera import (  # noqa
    CameraParams, project_points, backproject_to_pitch, camera_matrix,
)
from tracklab_tpu.calibration.pitch import pitch_segments  # noqa
from tracklab_tpu.calibration.tvcalib import (  # noqa
    optimize_cameras, TVCalibConfig,
)
