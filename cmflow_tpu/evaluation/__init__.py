from cmflow_tpu.evaluation.metrics import (
    LIDAR_RES,
    RADAR_RES,
    cartesian_res,
    eval_motion_seg,
    eval_scene_flow,
    eval_trans_rpe,
)

__all__ = [
    "LIDAR_RES",
    "RADAR_RES",
    "cartesian_res",
    "eval_motion_seg",
    "eval_scene_flow",
    "eval_trans_rpe",
]
