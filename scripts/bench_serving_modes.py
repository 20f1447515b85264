#!/usr/bin/env python
"""Measure fused serving engine modes on TPU: f32 vs bf16, single-dispatch
vs macro-batched scan.  Honest fetch-synced timing (CLAUDE.md)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "64"))
N = int(os.environ.get("N", "256"))
S = int(os.environ.get("S", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clouds, _rtt_seconds
    from cmflow_tpu.models import build_model
    from cmflow_tpu.models.inference import cmflow_infer, cmflow_infer_many

    print(f"backend={jax.default_backend()}", flush=True)
    model = build_model("cmflow")
    pc1, pc2, ft1, ft2 = map(jnp.asarray, make_clouds(B, N))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           pc1, pc2, ft1, ft2, None, False)

    rng = np.random.RandomState(1)
    stk = lambda x: jnp.asarray(
        np.stack([np.asarray(x)] * S) *
        (1.0 + 0.01 * rng.randn(S, 1, 1, 1).astype(np.float32)))
    spc1, spc2, sft1, sft2 = stk(pc1), stk(pc2), stk(ft1), stk(ft2)

    results = {}

    def time_single(name, dtype):
        @jax.jit
        def fwd(v, a, c, d, e):
            sf, *_ = cmflow_infer(v, a, c, d, e, compute_dtype=dtype)
            return sf.astype(jnp.float32) * 1e-6 + d

        t0 = time.perf_counter()
        f = fwd(variables, pc1, pc2, ft1, ft2)
        float(f[0, 0, 0])
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = []
        for _ in range(3):
            rtt = _rtt_seconds()
            f = ft1
            t0 = time.perf_counter()
            iters = 30
            for _ in range(iters):
                f = fwd(variables, pc1, pc2, f, ft2)
            float(f[0, 0, 0])
            dt = time.perf_counter() - t0 - rtt
            best.append(dt / iters * 1e3)
        ms = float(np.median(best))
        results[name] = ms
        print(f"{name}: {ms:.2f} ms/it -> {B/ms*1e3:.0f} frames/s "
              f"(passes {[f'{x:.1f}' for x in best]})", flush=True)

    def time_scan(name, dtype):
        @jax.jit
        def fwd(v, a, c, d, e):
            sf, cls, trans, mask = cmflow_infer_many(
                v, a, c, d, e, compute_dtype=dtype)
            return sf

        t0 = time.perf_counter()
        out = fwd(variables, spc1, spc2, sft1, sft2)
        float(out[0, 0, 0, 0])
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = []
        for _ in range(3):
            rtt = _rtt_seconds()
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                # no host data dependency needed: executions on one device
                # queue in order; the final fetch syncs the whole chain
                out = fwd(variables, spc1, spc2, sft1, sft2)
            float(out[0, 0, 0, 0])
            dt = time.perf_counter() - t0 - rtt
            best.append(dt / (reps * S) * 1e3)
        ms = float(np.median(best))
        results[name] = ms
        print(f"{name}: {ms:.2f} ms/it -> {B/ms*1e3:.0f} frames/s "
              f"(passes {[f'{x:.1f}' for x in best]})", flush=True)

    time_single("single_f32", jnp.float32)
    time_single("single_bf16", jnp.bfloat16)
    time_scan(f"scan{S}_f32", jnp.float32)
    time_scan(f"scan{S}_bf16", jnp.bfloat16)
    print(results, flush=True)


if __name__ == "__main__":
    main()
