#!/usr/bin/env python
"""Compiled engine-vs-flax parity check on the real TPU — all 3 engines.

Runs the fused serving engines (models/inference.py) and the flax
forwards on identical inputs and reports max deltas — the compiled twin
of tests/test_fused.py (which runs interpret-mode on CPU).  Run after
any serving-engine change once a TPU is reachable.

Engines certified (VERDICT r3 item 1):
  cmflow    — cmflow_infer vs CMFlow.apply
  raflow    — raflow_infer vs RaFlow.apply (double weighted-Kabsch +
              Doppler-residual SFR re-fit, models/raflow.py:78-114)
  cmflow_t  — cmflow_t_infer vs CMFlowT.apply over a T-frame carry
              chain (GRU carry, models/cmflow_t.py:94-107); per-step
              sf/cls/trans/gfeat deltas, carry chained within each side

Known benign deltas (CLAUDE.md round-3): sf max-diff is the stat_thres
flip at cls ~= 0.5 with random init; mask agreement 99.7-99.9%.

Env: B (default 16), NS (comma list, default 256,384,512),
DTYPES (comma list, default float32,bfloat16),
MODELS (default cmflow,raflow,cmflow_t), T (carry chain len, default 5).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "16"))
NS = [int(x) for x in os.environ.get("NS", "256,384,512").split(",")]
DTYPES = os.environ.get("DTYPES", "float32,bfloat16").split(",")
MODELS = os.environ.get("MODELS", "cmflow,raflow,cmflow_t").split(",")
T = int(os.environ.get("T", "5"))
# interpret-mode fallback so the script can smoke-run on CPU during
# tunnel outages (auto: interpret iff the backend is cpu)
INTERPRET = os.environ.get("INTERPRET", "auto")

# threshold classes (see the trans note below): (f32, bf16)
THRES = {"cls": (1e-3, 3e-2), "trans": (5e-4, 1e-2), "agree": 0.99}


def _interp(jax):
    if INTERPRET == "auto":
        return jax.default_backend() == "cpu"
    return INTERPRET not in ("0", "false", "False")


def _row(tag, dt, cls_d, tr_d, agree, sf_d, extra=""):
    ok = (cls_d < THRES["cls"][dt != "float32"]
          and tr_d < THRES["trans"][dt != "float32"]
          and agree > THRES["agree"])
    print(f"{tag} {dt}: cls {cls_d:.2e}  trans {tr_d:.2e}  "
          f"mask agree {agree * 100:.2f}%  sf {sf_d:.2e}{extra}", flush=True)
    print("  ->", "OK" if ok else "SUSPECT", flush=True)
    return ok


def check_cmflow(jax, jnp, make_clouds, build_model, oks):
    from cmflow_tpu.models.inference import cmflow_infer

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
                                    interpret=_interp(jax),
                                    compute_dtype=dtype)
            )(variables, pc1, pc2, ft1, ft2)
            cls_d = float(np.abs(np.asarray(cls) - cls_r).max())
            tr_d = float(np.abs(np.asarray(tr) - np.asarray(tr_r)).max())
            agree = float((np.asarray(mask) == np.asarray(mask_r)).mean())
            sf_d = float(np.abs(np.asarray(sf) - np.asarray(sf_r)).max())
            # trans bound: engine and flax flows differ by ~1e-5, and the
            # t = cb - R ca assembly amplifies a dR of 1e-5 by the ~21 m
            # scene centroid — ~2e-4 is the parity floor even with both
            # solvers at f64 truth (scripts/diag_kabsch_tpu.py)
            oks.append(_row(f"cmflow  N={n}", dt, cls_d, tr_d, agree, sf_d))


def check_raflow(jax, jnp, make_clouds, build_model, oks):
    from cmflow_tpu.models.inference import raflow_infer

    model = build_model("raflow")
    for n in NS:
        pc1, pc2, ft1, ft2 = map(jnp.asarray, make_clouds(B, n, seed=n))
        iv = jnp.full((B,), 0.1, jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               pc1, pc2, ft1, ft2, iv, False)
        out_r, sf_r, tr_r, mask_r = jax.jit(
            lambda v, a, b_, c, d, e: model.apply(v, a, b_, c, d, e, False)
        )(variables, pc1, pc2, ft1, ft2, iv)
        for dt in DTYPES:
            dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
            out, sf, tr, mask = jax.jit(
                lambda v, a, b_, c, d, e: raflow_infer(v, a, b_, c, d, e,
                                       interpret=_interp(jax),
                                       compute_dtype=dtype)
            )(variables, pc1, pc2, ft1, ft2, iv)
            # raflow has no cls; report the coarse-flow delta in its slot
            out_d = float(np.abs(np.asarray(out) -
                                 np.asarray(out_r)).max())
            tr_d = float(np.abs(np.asarray(tr) - np.asarray(tr_r)).max())
            agree = float((np.asarray(mask) == np.asarray(mask_r)).mean())
            sf_d = float(np.abs(np.asarray(sf) - np.asarray(sf_r)).max())
            # the Doppler inlier mask |residual/v_r| < thres flips where
            # the ratio sits at the threshold — sf max-diff then reflects
            # rigid-vs-raw flow selection on flipped points (benign, same
            # class as cmflow's stat_thres flips)
            oks.append(_row(f"raflow  N={n}", dt, out_d, tr_d, agree, sf_d))


def check_cmflow_t(jax, jnp, make_clouds, build_model, oks):
    from cmflow_tpu.models.inference import cmflow_t_infer

    model = build_model("cmflow_t")
    for n in NS:
        frames = [tuple(map(jnp.asarray, make_clouds(B, n, seed=n + 97 * t)))
                  for t in range(T)]
        g0 = jnp.zeros((B, model.cfg.prop_width), jnp.float32)
        pc1, pc2, ft1, ft2 = frames[0]
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               pc1, pc2, ft1, ft2, None, False, g0)
        ref_fn = jax.jit(
            lambda v, a, b_, c, d, g: model.apply(v, a, b_, c, d, None,
                                                  False, g))
        for dt in DTYPES:
            dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
            eng_fn = jax.jit(
                lambda v, a, b_, c, d, g: cmflow_t_infer(
                    v, a, b_, c, d, g, interpret=_interp(jax),
                    compute_dtype=dtype))
            g_r, g_e = g0, g0
            worst = dict(cls=0.0, tr=0.0, agree=1.0, sf=0.0, g=0.0,
                         raw=1.0)
            for t, (pc1, pc2, ft1, ft2) in enumerate(frames):
                sf_r, cls_r, tr_r, mask_r, g_r = ref_fn(
                    variables, pc1, pc2, ft1, ft2, g_r)
                sf, cls, tr, mask, g_e = eng_fn(
                    variables, pc1, pc2, ft1, ft2, g_e)
                # carry chains WITHIN each side: step-t deltas include
                # accumulated carry drift, the thing being certified
                worst["cls"] = max(worst["cls"], float(
                    np.abs(np.asarray(cls) - np.asarray(cls_r)).max()))
                worst["tr"] = max(worst["tr"], float(
                    np.abs(np.asarray(tr) - np.asarray(tr_r)).max()))
                # cmflow_t's mask is stat_cls > thres on the RAW cls, and
                # under random init the classifier sits at sigmoid(~0) =
                # 0.5 — a large mass lies within 1e-6 of the threshold,
                # where any backend delta flips the bit.  Certify
                # agreement AWAY from the boundary (|cls-thres| > 1e-5,
                # ~10x the observed cls delta); report raw alongside.
                eq = np.asarray(mask) == np.asarray(mask_r)
                core = np.abs(np.asarray(cls_r, np.float32).reshape(
                    eq.shape) - 0.5) > 1e-5
                worst["raw"] = min(worst["raw"], float(eq.mean()))
                worst["agree"] = min(worst["agree"], float(
                    eq[core].mean() if core.any() else 1.0))
                worst["sf"] = max(worst["sf"], float(
                    np.abs(np.asarray(sf) - np.asarray(sf_r)).max()))
                worst["g"] = max(worst["g"], float(
                    np.abs(np.asarray(g_e, np.float32) -
                           np.asarray(g_r, np.float32)).max()))
            oks.append(_row(
                f"cmflow_t N={n} T={T}", dt, worst["cls"], worst["tr"],
                worst["agree"], worst["sf"],
                extra=(f"  gfeat {worst['g']:.2e}"
                       f"  raw-agree {worst['raw'] * 100:.2f}%")))


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clouds
    from cmflow_tpu.models import build_model

    print(f"backend={jax.default_backend()}", flush=True)
    oks = []
    checks = {"cmflow": check_cmflow, "raflow": check_raflow,
              "cmflow_t": check_cmflow_t}
    for name in MODELS:
        checks[name](jax, jnp, make_clouds, build_model, oks)
    print(f"\n{sum(oks)}/{len(oks)} rows OK", flush=True)

    from cmflow_tpu.utils.runtime import exit_now_if_tunneled

    exit_now_if_tunneled()


if __name__ == "__main__":
    main()
