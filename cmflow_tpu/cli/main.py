"""CLI entry point — equivalent of the reference ``main.py``:

    python -m cmflow_tpu.cli.main [--eval] [--vis] [--save_res]
        --dataset_path ... --exp_name ... --model cmflow
        --dataset vodDataset [--config configs/cmflow.yaml]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cmflow_tpu.utils.config import load_config


def parse_args():
    p = argparse.ArgumentParser(description="Radar scene flow (TPU)")
    p.add_argument("--config", type=str, default=None,
                   help="YAML config (reference configs.yaml keys)")
    p.add_argument("--eval", action="store_true", default=None)
    p.add_argument("--vis", action="store_true", default=None)
    p.add_argument("--save_res", action="store_true", default=None)
    p.add_argument("--dataset_path", type=str, default=None)
    p.add_argument("--exp_name", type=str, default=None)
    p.add_argument("--model", type=str, default=None,
                   choices=[None, "raflow", "cmflow", "cmflow_t"])
    p.add_argument("--dataset", type=str, default=None,
                   choices=[None, "vodDataset", "vodClipDataset",
                            "vodPackedDataset"])
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--platform", type=str, default=None,
                   choices=[None, "auto", "cpu", "tpu"])
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="training activation dtype (params/stats stay f32)")
    p.add_argument("--eval_compute_dtype", type=str, default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="serving-engine dtype for evaluation passes")
    p.add_argument("--remat", default=None, nargs="?", const=True,
                   choices=[True, "dots"],
                   type=lambda v: True if v in ("1", "true", "full") else v,
                   help="recompute grouped [B,N,K,C] chains in backward "
                        "(bare flag = full remat; 'dots' keeps MXU outputs "
                        "and recomputes only BN/activation slices)")
    p.add_argument("--eval_wire", type=str, default=None,
                   choices=[None, "float32", "int16"],
                   help="eval host->device wire format (int16 halves the "
                        "packed upload; ~mm coordinate resolution)")
    p.add_argument("--eval_batch_size", type=int, default=None,
                   help="frames per device batch at eval (bigger batches "
                        "amortize the per-batch host RPCs)")
    return p.parse_args()


def main():
    args = parse_args()
    overrides = {k: v for k, v in vars(args).items()
                 if k != "config" and v is not None}
    cfg = load_config(args.config, overrides)

    np.random.seed(cfg.seed)

    if cfg.platform and cfg.platform != "auto":
        import jax

        jax.config.update("jax_platforms", cfg.platform)

    if cfg.nan_check:
        import jax

        jax.config.update("jax_debug_nans", True)

    from cmflow_tpu.train.loop import eval_experiment, train_experiment
    from cmflow_tpu.utils.logging import IOStream, init_experiment_dir

    exp_dir = init_experiment_dir(cfg.checkpoints_dir, cfg.exp_name, cfg)
    textio = IOStream(os.path.join(exp_dir, "run.log"))
    textio.cprint(str(cfg))

    if cfg.profile_dir:
        import jax

        jax.profiler.start_trace(cfg.profile_dir)
    try:
        if cfg.eval:
            eval_experiment(cfg, textio)
        else:
            train_experiment(cfg, textio)
    finally:
        if cfg.profile_dir:
            import jax

            jax.profiler.stop_trace()
    print("FINISH")
    # the tunneled TPU platform hangs interpreter teardown indefinitely;
    # everything is flushed/fetched by now (utils/runtime.py)
    from cmflow_tpu.utils.runtime import exit_now_if_tunneled

    exit_now_if_tunneled()


if __name__ == "__main__":
    main()
