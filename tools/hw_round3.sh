#!/bin/bash
# Round-3 hardware session: gates -> engine probes -> benches.
# Run from the repo root when the axon tunnel is up; tees to tools/hw_r3_logs/.
# Each step is independently resumable: comment out what already ran.
set -u
mkdir -p tools/hw_r3_logs
L=tools/hw_r3_logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a "$L/driver.log"
  timeout "${STEP_TIMEOUT:-3600}" "$@" 2>&1 | tee "$L/$name.log" | tail -n 25
  rc=${PIPESTATUS[0]}
  echo "=== $name exit=$rc ($(date))" | tee -a "$L/driver.log"
}

# 1. TPU-only exact gates (incl. the new scan-engine gates)
RICHDEM_TPU_TEST_TPU=1 run gates python -m pytest tests/test_tpu_only.py -q

# 2. Engine probes: rotation counts + ms/rot for every engine pair
run probe_scan_4096 python tools/probe_scan.py 4096
run probe_quinn_4096 python tools/probe_scan.py 4096 quinn
run probe_flats_4096 python tools/probe_flats.py 4096

# 2b. Out-of-core 16k^2 two-pass fill, DEVICE consumer (VERDICT r2
#     missing #1 done-criterion: >=10x over the 297 s round-2 figure)
run ooc_16k python tools/outofcore_bench.py 16384 4096 device

# 3. Benches (pinned baseline; roofline printed per config)
BENCH_CONFIG=fill_flats BENCH_SIZE=4096 run bench_c2_4096 python bench.py
BENCH_CONFIG=dinf_twi  BENCH_SIZE=4096 run bench_c4_4096 python bench.py
BENCH_CONFIG=quinn_mfd BENCH_SIZE=4096 run bench_quinn_4096 python bench.py
BENCH_CONFIG=dinf_twi  BENCH_SIZE=8192 run bench_c4_8192 python bench.py
BENCH_CONFIG=pipeline  BENCH_SIZE=8192 run bench_c3_8192 python bench.py
BENCH_CONFIG=pipeline  BENCH_SIZE=10240 run bench_c3_10240 python bench.py

# 4. Steady-state (tunnel sync amortized over 8 back-to-back steps)
BENCH_CONFIG=fill_flats BENCH_SIZE=4096 BENCH_BATCH=8 run bench_c2_4096_ss python bench.py
BENCH_CONFIG=dinf_twi  BENCH_SIZE=4096 BENCH_BATCH=8 run bench_c4_4096_ss python bench.py
BENCH_CONFIG=pipeline  BENCH_SIZE=8192 BENCH_BATCH=8 run bench_c3_8192_ss python bench.py

echo "ALL DONE $(date)" | tee -a "$L/driver.log"
