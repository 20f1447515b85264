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

from cmflow_tpu.data.packed import packed_vod_dataset

DATASET_REGISTRY = {
    "vodDataset": VodDataset,
    "vodClipDataset": VodClipDataset,
    # zero-parse memmap feed (packs the json tree on first use) — the
    # production choice on hosts where per-sample json parsing competes
    # with the eval loop for CPU
    "vodPackedDataset": packed_vod_dataset,
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
