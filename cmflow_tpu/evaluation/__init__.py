from cmflow_tpu.evaluation import metrics
from cmflow_tpu.evaluation.metrics import (
    LIDAR_RES,
    RADAR_RES,
    cartesian_res,
    eval_motion_seg,
    eval_motion_seg_batch,
    eval_scene_flow,
    eval_scene_flow_batch,
    eval_trans_rpe,
    eval_trans_rpe_batch,
)

__all__ = [
    "LIDAR_RES",
    "RADAR_RES",
    "cartesian_res",
    "eval_motion_seg",
    "eval_motion_seg_batch",
    "eval_scene_flow",
    "eval_scene_flow_batch",
    "eval_trans_rpe",
    "eval_trans_rpe_batch",
    "metrics",
]
