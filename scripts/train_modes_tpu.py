#!/usr/bin/env python
"""Measure the cmflow train step on TPU across {f32, bf16} x {remat
off, on} with bench.py's honest fetch-synced timing.  Drives the remat
default decision (CLAUDE.md round-4 knob).

Env: B (64), N (256), BENCH_TPU_ITERS, BENCH_PASSES.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "64"))
N = int(os.environ.get("N", "256"))


def main():
    import jax

    from bench import bench_tpu_train

    print(f"backend={jax.default_backend()}", flush=True)
    for dtype in ("bfloat16", "float32"):
        for remat in (False, True):
            try:
                bench_tpu_train(B, N, dtype, remat=remat)
            except Exception as e:
                print(f"{dtype} remat={remat} FAILED: {e}", flush=True)

    from cmflow_tpu.utils.runtime import exit_now_if_tunneled

    exit_now_if_tunneled()


if __name__ == "__main__":
    main()
