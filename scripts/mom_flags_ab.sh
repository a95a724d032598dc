#!/bin/bash
# Momentum-plateau XLA-flag A/B (VERDICT r3 #4): the ~69%-of-peak
# momentum-0.9 drain re-measured under XLA scheduler/VMEM flag variants
# plus the two-program split (scripts/mfu_drain_ab.py --config mom9_split).
# Each variant is a fresh process (XLA_FLAGS bind at backend init) and a
# fresh compile. Run ON the TPU, one variant at a time.
set -o pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$REPO:/root/.axon_site

run() {
  local name="$1"; shift
  local flags="$1"; shift
  echo "=== $name  XLA_FLAGS='$flags' ==="
  XLA_FLAGS="$flags" timeout 1200 python -u $REPO/scripts/mfu_drain_ab.py \
    --config "${CONFIG:-mom9}" 2>&1 | grep -E "us/bunch|error|Error" | tail -2
}

run baseline ""
run lhs_off "--xla_tpu_enable_latency_hiding_scheduler=false"
run lhs_rerun5 "--xla_latency_hiding_scheduler_rerun=5"
run vmem32m "--xla_tpu_scoped_vmem_limit_kib=32768"
run vmem64m "--xla_tpu_scoped_vmem_limit_kib=65536"
CONFIG=mom9_split run split ""
echo "=== done ==="
