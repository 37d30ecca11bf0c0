#!/bin/bash
# Round-4 hardware session: probes -> benches -> gates.  Resumable like
# tools/hw_round3.sh (a step whose .done marker exists is skipped), so
# re-running after a tunnel drop resumes where it died.  Ordered by
# decision value: the engine probes pick the config-4 D-infinity engine
# and the flats scan depth; then the bench matrix records the round-4
# numbers; the exact gates certify the round-4 kernel changes
# (flats incremental combine, MFD depth-8 default) bit-exact on hardware.
set -u
mkdir -p tools/hw_r4_logs
L=tools/hw_r4_logs
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; shift
  if [ -f "$L/$name.done" ]; then
    echo "=== $name: already done, skipping" | tee -a "$L/driver.log"
    return 0
  fi
  echo "=== $name: $* ($(date))" | tee -a "$L/driver.log"
  timeout "${STEP_TIMEOUT:-1200}" "$@" 2>&1 | tee "$L/$name.log" | tail -n 25
  rc=${PIPESTATUS[0]}
  echo "=== $name exit=$rc ($(date))" | tee -a "$L/driver.log"
  [ "$rc" -eq 0 ] && touch "$L/$name.done"
}

# 1. Engine probes (pick production defaults)
run probe_dinf_engines python tools/probe_dinf_engines.py 4096
run probe_flats_depth  python tools/probe_flats_depth.py 4096

# 2. Bench matrix (per-config pinned baselines; steady-state = batch 8)
BENCH_CONFIG=quinn_mfd  BENCH_SIZE=4096 STEP_TIMEOUT=900 run bench_quinn_4096 python bench.py
BENCH_CONFIG=quinn_mfd  BENCH_SIZE=4096 BENCH_BATCH=8 STEP_TIMEOUT=900 run bench_quinn_4096_ss python bench.py
BENCH_CONFIG=dinf_twi   BENCH_SIZE=4096 BENCH_BATCH=8 STEP_TIMEOUT=900 run bench_c4_4096_ss python bench.py
BENCH_CONFIG=fill_flats BENCH_SIZE=4096 BENCH_BATCH=8 STEP_TIMEOUT=900 run bench_c2_4096_ss python bench.py
BENCH_CONFIG=pipeline   BENCH_SIZE=8192 BENCH_BATCH=8 STEP_TIMEOUT=900 run bench_c3_8192_ss python bench.py
BENCH_CONFIG=dinf_twi   BENCH_SIZE=8192 BENCH_BATCH=8 STEP_TIMEOUT=900 run bench_c4_8192_ss python bench.py

# 3. TPU-only exact gates (certify the round-4 kernel changes)
RICHDEM_TPU_TEST_TPU=1 STEP_TIMEOUT=2400 run gates python -m pytest tests/test_tpu_only.py -q

echo "ALL DONE $(date)" | tee -a "$L/driver.log"
