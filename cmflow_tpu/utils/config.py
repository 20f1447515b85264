"""Config system: dataclass + YAML + CLI overrides.

Key names intentionally match the reference ``configs.yaml`` (SURVEY.md §5)
so recipes port 1:1: num_points, batch_size, val_batch_size, epochs, lr,
decay_epochs, decay_rate, seed, num_workers, eval_split, train_set,
dataset, dataset_path, rigid_thres, vr_thres, stat_thres, mini_clip_len,
update_len, load_checkpoint, model_path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml


@dataclasses.dataclass
class Config:
    exp_name: str = "cmflow_tpu"
    model: str = "cmflow"

    # training
    num_points: int = 256
    batch_size: int = 16
    val_batch_size: int = 8
    epochs: int = 60
    lr: float = 1e-3
    weight_decay: float = 1e-4
    decay_epochs: int = 1
    decay_rate: float = 0.9

    # runtime
    seed: int = 1234
    num_workers: int = 8
    data_parallel: bool = True  # shard batch over all local devices
    platform: str = "auto"  # jax platform override: auto|cpu|tpu (the
    # session sitecustomize pins a platform; env vars alone cannot move it)
    compute_dtype: str = "float32"  # or "bfloat16" for the matmul-heavy path
    # recompute grouped chains in backward: False | True (full, measured to
    # lose) | "dots" (keep MXU outputs, recompute BN/activation slices)
    remat: object = False
    fused_inference: str = "auto"  # Pallas fused eval: auto|on|off
    # eval host->device wire format: float32 (lossless, default) | int16
    # (symmetric per-array quantization, ~45% smaller packed batches —
    # 1.8 mm coordinate resolution at VoD range, for host-link-bound runs)
    # int16 measured −18% end-to-end eval wall on the upload-bound
    # tunnel host at ~1e-5 metric deltas (docs/PERF.md "Pipeline" A/B);
    # float32 restores the lossless wire
    eval_wire: str = "int16"
    nan_check: bool = False  # jax_debug_nans toggle (SURVEY.md §5 sanitizers)
    profile_dir: Optional[str] = None  # jax.profiler trace output

    # dataset
    eval: bool = False
    eval_split: str = "test"
    dataset: str = "vodDataset"
    train_set: str = "train"
    dataset_path: str = ""
    vis: bool = False
    save_res: bool = False
    eval_pad_multiple: int = 128  # static bucket granularity for eval shapes
    # pinned eval shape set: every eval batch pads to one of these N and
    # nothing else (an unexpected shape = a fresh multi-minute remote
    # compile mid-epoch); frames above the top bucket fail loudly.
    # Buckets below num_points are ignored (num_points is the floor).
    eval_buckets: tuple = (256, 384, 512)
    # frames per device batch during (non-temporal) evaluation; the
    # reference evaluated at B=1 (main.py:202-203) which on a tunneled TPU
    # is RTT-bound — batching + pipelined fetches recovers device throughput
    eval_batch_size: int = 64
    eval_compute_dtype: str = "float32"  # fused-serving dtype: or "bfloat16"

    # method parameters
    rigid_thres: float = 0.15
    vr_thres: float = 0.3
    stat_thres: float = 0.5

    # GRU / temporal
    mini_clip_len: int = 5
    update_len: int = 5

    # checkpointing
    load_checkpoint: bool = False
    model_path: str = ""
    checkpoints_dir: str = "checkpoints"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_config(
    yaml_path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None
) -> Config:
    """Load a Config from YAML (all keys optional) and apply overrides."""
    data: Dict[str, Any] = {}
    if yaml_path:
        with open(yaml_path, "r") as f:
            data.update(yaml.safe_load(f) or {})
    if overrides:
        data.update({k: v for k, v in overrides.items() if v is not None})
    known = {f.name for f in dataclasses.fields(Config)}
    unknown = set(data) - known
    if unknown:
        raise KeyError(f"unknown config keys: {sorted(unknown)}")
    return Config(**data)
