#!/usr/bin/env python
"""Profile the cmflow train step per-op on the real TPU.

Captures a jax.profiler trace of a few train steps and prints the top ops
by total device time (parsed from the trace.json.gz the profiler writes).
Used to drive the train-step optimization work (VERDICT r1 item 4).

Env: DTYPE=float32|bfloat16, B, N, OUT (trace dir), STEPS.
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "64"))
N = int(os.environ.get("N", "256"))
STEPS = int(os.environ.get("STEPS", "5"))
DTYPE = os.environ.get("DTYPE", "float32")
OUT = os.environ.get("OUT", "/tmp/trace_train")


def main():
    import types

    import jax
    import jax.numpy as jnp

    from bench import make_clouds
    from cmflow_tpu.data.vod import VOD_CAMERA_PROJECTION, VOD_T_CAMERA_RADAR
    from cmflow_tpu.models import build_model
    from cmflow_tpu.train import steps as steplib
    from cmflow_tpu.train.state import create_train_state, make_optimizer

    model = build_model(
        "cmflow", types.SimpleNamespace(compute_dtype=DTYPE, stat_thres=0.5))
    pc1, pc2, ft1, ft2 = map(jnp.asarray, make_clouds(B, N))
    rng = np.random.RandomState(1)
    batch = {
        "pc1": pc1, "pc2": pc2, "ft1": ft1, "ft2": ft2,
        "trans": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                     (B, 1, 1))),
        "labels": jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.1),
        "mask": jnp.asarray((rng.rand(B, N) > 0.3).astype(np.float32)),
        "interval": jnp.full((B,), 0.1, jnp.float32),
        "radar_u": jnp.asarray(rng.rand(B, N).astype(np.float32) * 1900),
        "radar_v": jnp.asarray(rng.rand(B, N).astype(np.float32) * 1200),
        "opt_flow": jnp.asarray(rng.randn(B, N, 2).astype(np.float32)),
    }
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (pc1, pc2, ft1, ft2, batch["mask"], True), make_optimizer())
    step = steplib.make_train_step("cmflow", model, VOD_CAMERA_PROJECTION,
                                   VOD_T_CAMERA_RADAR)
    t0 = time.perf_counter()
    state, items = step(state, batch)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    float(items["Loss"])

    with jax.profiler.trace(OUT):
        for _ in range(STEPS):
            state, items = step(state, batch)
        float(items["Loss"])

    paths = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    top_ops(paths[-1], STEPS)


def top_ops(path, steps, top=40):
    import re

    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    # individual op events live on the device pid's "XLA Ops" thread
    op_keys = {k for k, name in tids.items()
               if name == "XLA Ops" and "TPU" in pids.get(k[0], "")}
    tot = collections.Counter()
    grp = collections.Counter()
    info = {}
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_keys:
            continue
        name = e.get("name", "")
        tot[name] += e.get("dur", 0)
        grp[re.sub(r"\.\d+$", "", name)] += e.get("dur", 0)
        info.setdefault(name, e.get("args", {}))
    all_us = sum(tot.values())
    print(f"device total: {all_us / 1e3 / steps:.2f} ms/step "
          f"over {steps} steps  ({path})")
    print("-- grouped by op-name prefix --")
    for name, us in grp.most_common(20):
        print(f"{us / 1e3 / steps:8.3f} ms/step  {name}")
    print("-- top individual ops --")
    for name, us in tot.most_common(top):
        op = info[name].get("tf_op", "")[:80]
        print(f"{us / 1e3 / steps:8.3f} ms/step  {name[:28]:28s} {op}")


if __name__ == "__main__":
    if len(sys.argv) > 1:  # parse an existing trace: profile_train.py <path>
        top_ops(sys.argv[1], int(os.environ.get("STEPS", "5")))
    else:
        main()
