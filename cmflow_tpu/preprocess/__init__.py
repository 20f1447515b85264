from cmflow_tpu.preprocess import boxes, flow_samples, optical_flow, vod_io
from cmflow_tpu.preprocess.flow_samples import (
    SCENE_FLOW_SPLITS,
    build_sample,
    process_clip,
    run_preprocess,
)

__all__ = [
    "SCENE_FLOW_SPLITS",
    "boxes",
    "build_sample",
    "flow_samples",
    "optical_flow",
    "process_clip",
    "run_preprocess",
    "vod_io",
]
