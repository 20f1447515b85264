#!/usr/bin/env python
"""Compiled engine-vs-flax parity check on the real TPU.

Runs the fused serving engine (models/inference.py) and the flax forward
on identical inputs and reports max deltas — the compiled twin of
tests/test_fused.py (which runs interpret-mode on CPU).  Run after any
serving-engine change once a TPU is reachable.

Known benign deltas (CLAUDE.md round-3): sf max-diff is the stat_thres
flip at cls ~= 0.5 with random init; mask agreement 99.7-99.9%.

Env: B (default 16), NS (comma list, default 256,384,512),
DTYPES (comma list, default float32,bfloat16).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "16"))
NS = [int(x) for x in os.environ.get("NS", "256,384,512").split(",")]
DTYPES = os.environ.get("DTYPES", "float32,bfloat16").split(",")


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clouds
    from cmflow_tpu.models import build_model
    from cmflow_tpu.models.inference import cmflow_infer

    print(f"backend={jax.default_backend()}", flush=True)
    model = build_model("cmflow")

    for n in NS:
        pc1, pc2, ft1, ft2 = map(jnp.asarray, make_clouds(B, n, seed=n))
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               pc1, pc2, ft1, ft2, None, False)
        sf_r, cls_r, tr_r, mask_r = jax.jit(
            lambda v, a, b_, c, d: model.apply(v, a, b_, c, d, None, False)
        )(variables, pc1, pc2, ft1, ft2)
        cls_r = np.asarray(cls_r)
        for dt in DTYPES:
            dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
            sf, cls, tr, mask = jax.jit(
                lambda v, a, b_, c, d: cmflow_infer(v, a, b_, c, d,
                                                    compute_dtype=dtype)
            )(variables, pc1, pc2, ft1, ft2)
            cls_d = float(np.abs(np.asarray(cls) - cls_r).max())
            tr_d = float(np.abs(np.asarray(tr) - np.asarray(tr_r)).max())
            agree = float((np.asarray(mask) == np.asarray(mask_r)).mean())
            sf_d = float(np.abs(np.asarray(sf) - np.asarray(sf_r)).max())
            print(f"N={n} {dt}: cls {cls_d:.2e}  trans {tr_d:.2e}  "
                  f"mask agree {agree * 100:.2f}%  sf {sf_d:.2e}", flush=True)
            # trans bound: engine and flax flows differ by ~1e-5, and the
            # t = cb - R ca assembly amplifies a dR of 1e-5 by the ~21 m
            # scene centroid — ~2e-4 is the parity floor even with both
            # solvers at f64 truth (scripts/diag_kabsch_tpu.py)
            ok = ((cls_d < 1e-3 if dt == "float32" else cls_d < 3e-2)
                  and tr_d < (5e-4 if dt == "float32" else 1e-2)
                  and agree > 0.99)
            print("  ->", "OK" if ok else "SUSPECT", flush=True)

    from cmflow_tpu.utils.runtime import exit_now_if_tunneled

    exit_now_if_tunneled()


if __name__ == "__main__":
    main()
