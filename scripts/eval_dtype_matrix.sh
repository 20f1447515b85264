#!/bin/bash
# Eval compute-dtype metric-delta matrix (docs/PERF.md "Eval
# compute-dtype metric deltas"): full CLI eval of each family's best
# synthetic checkpoint with --eval_compute_dtype float32 AND bfloat16,
# same checkpoint both sides, so the table measures exactly the metric
# cost of the bf16 serving default.  Reference equivalent of the loop
# being driven: main_util.py:93-206.
#
# Env knobs: DS (default /tmp/conv_ds — the synthetic-320 gate set),
# CMFLOW_CKPT / RAFLOW_CKPT / CMFLOW_T_CKPT (checkpoint DIRS under
# checkpoints/; default = the round-5 post-BN-fix gate runs).
# Full per-run logs land in /tmp/xd_<model>_<dtype>.full.log.
set -eo pipefail
DS=${DS:-/tmp/conv_ds}
CMFLOW_CKPT=${CMFLOW_CKPT:-conv60_cmflow}
RAFLOW_CKPT=${RAFLOW_CKPT:-conv_raflow_bf16_r5}
CMFLOW_T_CKPT=${CMFLOW_T_CKPT:-conv_cmflow_t_bf16_r5}
for spec in "cmflow $CMFLOW_CKPT float32" "cmflow $CMFLOW_CKPT bfloat16" \
            "raflow $RAFLOW_CKPT float32" "raflow $RAFLOW_CKPT bfloat16" \
            "cmflow_t $CMFLOW_T_CKPT float32" \
            "cmflow_t $CMFLOW_T_CKPT bfloat16"; do
  set -- $spec
  echo "=== model=$1 ckpt=$2 evaldtype=$3 ==="
  timeout 2400 python -m cmflow_tpu.cli.main --config "configs/$1.yaml" \
    --dataset_path "$DS" --exp_name "xd_$1_$3" --eval \
    --model_path "checkpoints/$2/models/best" \
    --eval_compute_dtype "$3" --batch_size 16 \
    > "/tmp/xd_$1_$3.full.log" 2>&1 || echo "RUN FAILED rc=$?"
  { grep -E "mean rne|mean miou|mean RTE|inference speed" \
      "/tmp/xd_$1_$3.full.log" || true; } | tail -5
done
echo XDTYPE_DONE
