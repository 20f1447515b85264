#!/usr/bin/env python
"""Reproduce the fused-eval timing with repeated passes (round-2 item 1).

Runs the compiled fused eval forward many passes and prints per-pass ms/it
plus the median/min/max, to separate real kernel time from tunnel/host
variance.  See VERDICT.md weak #1: driver measured 49.8 ms/it where the
ledger recorded 27.0 for the same code.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "64"))
N = int(os.environ.get("N", "256"))
ITERS = int(os.environ.get("ITERS", "50"))
PASSES = int(os.environ.get("PASSES", "7"))


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clouds, _rtt_seconds
    from cmflow_tpu.models import build_model
    from cmflow_tpu.models.inference import cmflow_infer

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    model = build_model("cmflow")
    pc1, pc2, ft1, ft2 = map(jnp.asarray, make_clouds(B, N))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           pc1, pc2, ft1, ft2, None, False)

    @jax.jit
    def fwd_chain(v, a, c, d, e):
        sf, cls, trans, mask = cmflow_infer(v, a, c, d, e)
        return sf * 1e-6 + d

    t0 = time.perf_counter()
    f = fwd_chain(variables, pc1, pc2, ft1, ft2)
    float(f[0, 0, 0])
    log(f"compile+first: {time.perf_counter()-t0:.1f}s")

    results = []
    for p in range(PASSES):
        rtt = _rtt_seconds()
        f = ft1
        t0 = time.perf_counter()
        for _ in range(ITERS):
            f = fwd_chain(variables, pc1, pc2, f, ft2)
        float(f[0, 0, 0])
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        ms = dt / ITERS * 1e3
        results.append(ms)
        log(f"pass {p}: {ms:.2f} ms/it (rtt {rtt*1e3:.1f} ms) "
            f"-> {B*ITERS/dt:.1f} frames/s")
    arr = np.array(results)
    log(f"median {np.median(arr):.2f} ms/it  min {arr.min():.2f}  "
        f"max {arr.max():.2f}  spread {(arr.max()-arr.min())/np.median(arr)*100:.0f}%")


if __name__ == "__main__":
    main()
