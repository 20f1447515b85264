#!/bin/bash
# Synthetic convergence gate (VERDICT r1 item 9): train cmflow for 24
# epochs on a 320-sample synthetic VoD-layout set and watch val RNE fall.
# Reference recipe: main.py:104-170.  Recorded runs:
#   f32  (v5e, 2026-08-17) val RNE 0.288 -> 0.100  docs/convergence_r2.jsonl
#   bf16 (CPU,  2026-08-18) val RNE 0.275 -> 0.105  docs/convergence_r3_bf16.jsonl
#        (DTYPE=bfloat16 PLATFORM=cpu — run during the tunnel outage; the
#        bf16 matmul semantics being gated are platform-independent)
# Env knobs: DS (dataset dir), EXP (exp name), DTYPE (train compute dtype),
# PLATFORM (auto|cpu|tpu — cpu keeps the gate runnable when the TPU tunnel
# is down), EPOCHS.
set -e
DS=${DS:-/tmp/conv_ds}
EXP=${EXP:-conv_run}
DTYPE=${DTYPE:-float32}
PLATFORM=${PLATFORM:-auto}
EPOCHS=${EPOCHS:-24}
if [ ! -d "$DS" ]; then
  python - <<PY
from cmflow_tpu.data.synthetic import write_synthetic_dataset
write_synthetic_dataset("$DS", {"train": 320, "val": 48, "test": 16}, seed=5)
PY
fi
python -m cmflow_tpu.cli.main --config configs/cmflow.yaml \
  --dataset_path "$DS" --exp_name "$EXP" --epochs "$EPOCHS" --batch_size 16 \
  --compute_dtype "$DTYPE" --platform "$PLATFORM"
python - <<PY
import json
rows = [json.loads(l) for l in open("checkpoints/$EXP/metrics.jsonl")]
rnes = [r["rne"] for r in rows if "rne" in r]
assert rnes[-1] < 0.6 * rnes[0], f"no convergence: {rnes[0]} -> {rnes[-1]}"
print(f"converged: val RNE {rnes[0]:.4f} -> {min(rnes):.4f}")
PY
