#!/bin/bash
# Round-3 hardware session: probes -> ooc -> benches -> gates.
# Run from the repo root when the axon tunnel is up; tees to tools/hw_r3_logs/.
# Each step is independently resumable: a step whose log already ends with
# "exit=0" is skipped, so re-running after a tunnel drop resumes where it died.
# Ordered by decision value (the round may end mid-session): engine probes
# first (they pick production defaults), then the VERDICT-#1 out-of-core
# criterion, then the config-2/4 >=40x benches, then the exact gates.
set -u
mkdir -p tools/hw_r3_logs
L=tools/hw_r3_logs
# `python tools/foo.py` puts tools/ (not the repo root) on sys.path; prepend
# the root WITHOUT clobbering the inherited path (the axon plugin lives there).
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

# 1. Engine probes: rotation counts + ms/rot for every engine pair; the
#    scan-depth sweep picks RICHDEM_TPU_SCAN_DEPTH / engine defaults.
run probe_scan_4096 python tools/probe_scan.py 4096
run probe_quinn_4096 python tools/probe_scan.py 4096 quinn
run probe_flats_4096 python tools/probe_flats.py 4096

# 2. Out-of-core 16k^2 two-pass fill, DEVICE consumer (VERDICT r2
#    missing #1 done-criterion: >=10x over the 297 s round-2 figure)
STEP_TIMEOUT=2400 run ooc_16k python tools/outofcore_bench.py 16384 4096 device

# 3. Benches (pinned baseline; roofline printed per config).  Steady-state
#    (BENCH_BATCH=8) is the VERDICT-#3 number; single-shot for comparability.
BENCH_CONFIG=fill_flats BENCH_SIZE=4096 BENCH_BATCH=8 STEP_TIMEOUT=900 run bench_c2_4096_ss python bench.py
BENCH_CONFIG=dinf_twi  BENCH_SIZE=4096 BENCH_BATCH=8 STEP_TIMEOUT=900 run bench_c4_4096_ss python bench.py
BENCH_CONFIG=quinn_mfd BENCH_SIZE=4096 STEP_TIMEOUT=900 run bench_quinn_4096 python bench.py
BENCH_CONFIG=fill_flats BENCH_SIZE=4096 STEP_TIMEOUT=900 run bench_c2_4096 python bench.py
BENCH_CONFIG=dinf_twi  BENCH_SIZE=4096 STEP_TIMEOUT=900 run bench_c4_4096 python bench.py
BENCH_CONFIG=dinf_twi  BENCH_SIZE=8192 STEP_TIMEOUT=900 run bench_c4_8192 python bench.py
BENCH_CONFIG=pipeline  BENCH_SIZE=8192 BENCH_BATCH=8 STEP_TIMEOUT=900 run bench_c3_8192_ss python bench.py
BENCH_CONFIG=pipeline  BENCH_SIZE=10240 STEP_TIMEOUT=900 run bench_c3_10240 python bench.py

# 4. TPU-only exact gates (incl. the new scan-engine gates)
RICHDEM_TPU_TEST_TPU=1 STEP_TIMEOUT=1800 run gates python -m pytest tests/test_tpu_only.py -q

echo "ALL DONE $(date)" | tee -a "$L/driver.log"
