#!/bin/bash
# A/B the eval wire format end-to-end (VERDICT r3 item 2): run the
# production CLI eval epoch (2,048 synthetic frames, B=64 — the same
# workload as docs/PERF.md "Pipeline") once with the lossless f32 wire
# and once with --eval_wire int16, on the SAME checkpoint, and report
# per-wire throughput (the "eval wall breakdown" line), upload seconds
# (the prefetch worker's h2d), and the full-epoch metric delta (mean
# RNE line).  Reference equivalent: main_util.py:93-206 (the eval loop
# whose ingestion this wire feeds).
#
# Env knobs: DS (default /tmp/pipe_ds — write_synthetic_dataset with
# {"test": 2048}, clips_per_partition=32, seed=11), CKPT (default
# checkpoints/conv60_cmflow/models/best), BATCH (default 64).
# Timing discipline (CLAUDE.md): run on an otherwise-idle host.
# -o pipefail: a crashed CLI eval must fail the A/B (with -e alone the
# pipeline's status was grep's, silently masking crashes); the grep gets
# `|| true` so a benign log-format change can't abort the comparison, and
# each run's full log is kept in /tmp/pipe_ab_$WIRE.log for post-mortems.
set -eo pipefail
DS=${DS:-/tmp/pipe_ds}
CKPT=${CKPT:-checkpoints/conv60_cmflow/models/best}
BATCH=${BATCH:-64}
if [ ! -d "$DS" ]; then
  python - <<PY
from cmflow_tpu.data.synthetic import write_synthetic_dataset
write_synthetic_dataset("$DS", {"test": 2048}, clips_per_partition=32,
                        seed=11)
PY
fi
for WIRE in float32 int16; do
  echo "=== eval_wire=$WIRE ==="
  python -m cmflow_tpu.cli.main --config configs/cmflow.yaml \
    --dataset_path "$DS" --exp_name "pipe_${WIRE}" --eval \
    --model_path "$CKPT" --eval_batch_size "$BATCH" \
    --eval_wire "$WIRE" 2>&1 | tee "/tmp/pipe_ab_${WIRE}.log" |
    { grep -E "mean RNE|inference speed|wall breakdown|prewarm|miou|RTE" \
      || true; }
done
