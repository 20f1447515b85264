#!/usr/bin/env python
"""Isolate the serving-engine trans delta (parity_tpu SUSPECT rows).

On the same flax-produced (pc1, warp, w) inputs, compares — all compiled
on the current backend — weighted_kabsch solver="svd" vs solver="polar",
plus a float64 numpy SVD ground truth on host.  Distinguishes:
  * polar3 diverging on TPU (svd-TPU == numpy, polar-TPU far),
  * TPU SVD custom-call inaccuracy (polar-TPU == numpy, svd-TPU far),
  * input-flow differences (both TPU solvers agree with numpy on these
    inputs — the delta must come from the upstream engine forward).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "16"))
N = int(os.environ.get("N", "256"))


def np_kabsch_f64(pc1, warp, w):
    """Reference float64 Kabsch (centroid='sum', reflect='row')."""
    out = np.zeros((pc1.shape[0], 4, 4))
    for i in range(pc1.shape[0]):
        a, b_, wi = pc1[i].astype(np.float64), warp[i].astype(np.float64), \
            w[i].astype(np.float64)
        ca = (a * wi[:, None]).sum(0)
        cb = (b_ * wi[:, None]).sum(0)
        am, bm = a - ca, b_ - cb
        h = am.T @ (wi[:, None] * bm)
        u, _, vh = np.linalg.svd(h)
        v = vh.T
        z = v @ u.T
        if np.linalg.det(z) < 0:
            v[2, :] *= -1
        r = v @ u.T
        t = cb - r @ ca
        out[i, :3, :3] = r
        out[i, :3, 3] = t
        out[i, 3, 3] = 1.0
    return out


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clouds
    from cmflow_tpu.geometry import se3
    from cmflow_tpu.models import build_model

    print(f"backend={jax.default_backend()}", flush=True)
    model = build_model("cmflow")
    pc1, pc2, ft1, ft2 = map(jnp.asarray, make_clouds(B, N, seed=N))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           pc1, pc2, ft1, ft2, None, False)

    # flax forward gives the canonical (output, cls); recompute w as
    # cmflow_infer does (models/inference.py:288-291)
    @jax.jit
    def flax_parts(v, a, b_, c, d):
        sf, cls, trans, mask = model.apply(v, a, b_, c, d, None, False)
        return sf, cls, trans

    sf_r, cls_r, trans_r = flax_parts(variables, pc1, pc2, ft1, ft2)
    cls_np = np.asarray(cls_r)
    print("flax done", flush=True)

    # reconstruct output (pre-aggregation flow): sf == where(mask, rigid,
    # output); at mask=0 points sf IS output.  For exactness, reproduce
    # output from the flax model by running with stat_thres > 1 so mask
    # is all-false and sf == output everywhere.
    import types
    model_raw = build_model("cmflow", types.SimpleNamespace(stat_thres=1e9))

    @jax.jit
    def flax_raw(v, a, b_, c, d):
        sf, cls, trans, mask = model_raw.apply(v, a, b_, c, d, None, False)
        return sf

    output = flax_raw(variables, pc1, pc2, ft1, ft2)
    out_np = np.asarray(output)
    print("raw flow done", flush=True)

    w = cls_np + 1e-4
    w = w / w.sum(1, keepdims=True)
    pc1_np = np.asarray(pc1)
    warp_np = pc1_np + out_np

    t64 = np_kabsch_f64(pc1_np, warp_np, w)

    wj = jnp.asarray(w)
    warpj = jnp.asarray(warp_np)

    for solver in ("svd", "polar"):
        tj = jax.jit(lambda a, b_, ww, s=solver: se3.weighted_kabsch(
            a, b_, ww, centroid="sum", reflect="row", solver=s))(
            pc1, warpj, wj)
        d = np.abs(np.asarray(tj) - t64)
        print(f"{solver}-{jax.default_backend()} vs numpy-f64: "
              f"max {d.max():.3e}  rot {d[:, :3, :3].max():.3e}  "
              f"t {d[:, :3, 3].max():.3e}", flush=True)

    d = np.abs(np.asarray(trans_r) - t64)
    print(f"flax-pipeline trans vs numpy-f64(on flax flow): max {d.max():.3e} "
          f" rot {d[:, :3, :3].max():.3e}  t {d[:, :3, 3].max():.3e}",
          flush=True)

    # H conditioning for context
    for i in range(min(4, B)):
        a, b_, wi = pc1_np[i].astype(np.float64), \
            warp_np[i].astype(np.float64), w[i].astype(np.float64)
        ca = (a * wi[:, None]).sum(0)
        cb = (b_ * wi[:, None]).sum(0)
        h = (a - ca).T @ (wi[:, None] * (b_ - cb))
        s = np.linalg.svd(h, compute_uv=False)
        print(f"H[{i}] singular values {s}, cond {s[0] / s[-1]:.1f}",
              flush=True)

    from cmflow_tpu.utils.runtime import exit_now_if_tunneled
    exit_now_if_tunneled()


if __name__ == "__main__":
    main()
