#!/bin/bash
# Poll the axon TPU tunnel; launch the round-4 hardware session when it
# answers.  The probe is a real compute round-trip (jax.devices() can
# respond while compute hangs — CLAUDE.md gotcha), under timeout so a
# half-dead tunnel doesn't wedge the watcher.
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/hw_r4_logs
L=tools/hw_r4_logs
for i in $(seq 1 200); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" >/dev/null 2>&1; then
    echo "tunnel UP, starting session ($(date))" >> "$L/watch.log"
    bash tools/hw_round4.sh
    exit 0
  fi
  echo "tunnel down, attempt $i ($(date))" >> "$L/watch.log"
  sleep 40
done
echo "gave up ($(date))" >> "$L/watch.log"
exit 1
