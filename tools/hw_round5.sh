#!/bin/bash
# Round-5 FINAL validation: gates + bench matrix with every settled
# round-5 default (D-inf scan depth 1 fused laterals, flats scan depth
# 8, MFD scan depth 8, d8 stencil scoped-vmem strip cap, strip-staged
# perlin > 12288^2).  Resumable per step.
set -u
mkdir -p tools/hw_r5_logs
L=tools/hw_r5_logs
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; shift
  if [ -f "$L/$name.done" ]; then
    echo "=== $name: already done, skipping" | tee -a "$L/driver.log"
    return 0
  fi
  echo "=== $name: $* ($(date))" | tee -a "$L/driver.log"
  timeout "${STEP_TIMEOUT:-1200}" "$@" 2>&1 | tee "$L/$name.log" | tail -n 5
  rc=${PIPESTATUS[0]}
  echo "=== $name exit=$rc ($(date))" | tee -a "$L/driver.log"
  [ "$rc" -eq 0 ] && touch "$L/$name.done"
}

RICHDEM_TPU_TEST_TPU=1 STEP_TIMEOUT=2400 run gates python -m pytest tests/test_tpu_only.py -q
STEP_TIMEOUT=1800 run c3_default python bench.py
BENCH_CONFIG=pipeline   BENCH_SIZE=8192  BENCH_BATCH=8 STEP_TIMEOUT=1800 run c3_8192_ss python bench.py
BENCH_CONFIG=pipeline   BENCH_SIZE=12288 BENCH_BATCH=4 BENCH_REPS=3 STEP_TIMEOUT=1800 run c3_12288_ss python bench.py
BENCH_CONFIG=pipeline   BENCH_SIZE=16384 BENCH_BATCH=4 BENCH_REPS=2 STEP_TIMEOUT=1800 run c3_16384_ss python bench.py
BENCH_CONFIG=fill_flats BENCH_SIZE=4096  BENCH_BATCH=8 STEP_TIMEOUT=1800 run c2_4096_ss python bench.py
BENCH_CONFIG=dinf_twi   BENCH_SIZE=4096  BENCH_BATCH=8 STEP_TIMEOUT=1800 run c4_4096_ss python bench.py
BENCH_CONFIG=dinf_twi   BENCH_SIZE=8192  BENCH_BATCH=8 STEP_TIMEOUT=1800 run c4_8192_ss python bench.py
BENCH_CONFIG=quinn_mfd  BENCH_SIZE=4096  BENCH_BATCH=8 STEP_TIMEOUT=1800 run quinn_4096_ss python bench.py
echo "ALL DONE $(date)" | tee -a "$L/driver.log"
