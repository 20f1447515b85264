from cmflow_tpu.data.loader import BatchLoader
from cmflow_tpu.data.schema import Sample, bucket_size, collate, pad_to
from cmflow_tpu.data.vod import (
    VOD_CAMERA_PROJECTION,
    VOD_INTERVAL,
    VOD_RADAR_RES,
    VOD_T_CAMERA_RADAR,
    VodClipDataset,
    VodDataset,
    decode_sample,
)

DATASET_REGISTRY = {
    "vodDataset": VodDataset,
    "vodClipDataset": VodClipDataset,
}

__all__ = [
    "BatchLoader",
    "DATASET_REGISTRY",
    "Sample",
    "VOD_CAMERA_PROJECTION",
    "VOD_INTERVAL",
    "VOD_RADAR_RES",
    "VOD_T_CAMERA_RADAR",
    "VodClipDataset",
    "VodDataset",
    "bucket_size",
    "collate",
    "decode_sample",
    "pad_to",
]
