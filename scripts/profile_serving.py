#!/usr/bin/env python
"""Profile the fused serving engine per-op on the real TPU.

Same trace-parsing as profile_train.py (top_ops), but traces the
Pallas serving forward (models/inference.py cmflow_infer) — used to find
what remains of the ~19 ms bf16 serving step beyond the gather floor.

Env: DTYPE=float32|bfloat16, B, N, OUT (trace dir), STEPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "64"))
N = int(os.environ.get("N", "256"))
STEPS = int(os.environ.get("STEPS", "10"))
DTYPE = os.environ.get("DTYPE", "bfloat16")
OUT = os.environ.get("OUT", "/tmp/trace_serving")


def main():
    import glob

    import jax
    import jax.numpy as jnp

    from bench import make_clouds
    from cmflow_tpu.models import build_model
    from cmflow_tpu.models.inference import cmflow_infer
    from scripts.profile_train import top_ops

    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    model = build_model("cmflow")
    pc1, pc2, ft1, ft2 = map(jnp.asarray, make_clouds(B, N))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           pc1, pc2, ft1, ft2, None, False)

    @jax.jit
    def fwd(v, a, c, d, e):
        sf, *_ = cmflow_infer(v, a, c, d, e, compute_dtype=dtype)
        return sf.astype(jnp.float32) * 1e-6 + d

    t0 = time.perf_counter()
    f = fwd(variables, pc1, pc2, ft1, ft2)
    float(f[0, 0, 0])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    with jax.profiler.trace(OUT):
        f = ft1
        for _ in range(STEPS):
            f = fwd(variables, pc1, pc2, f, ft2)
        float(f[0, 0, 0])

    paths = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    top_ops(paths[-1], STEPS)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        from scripts.profile_train import top_ops

        top_ops(sys.argv[1], STEPS)
    else:
        main()
