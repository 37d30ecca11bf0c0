#!/bin/bash
# Re-run the resumable round-5 session until every step is .done (or
# attempts run out).  Probes the tunnel with a real compute round-trip
# first (jax.devices() can answer while compute hangs — CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
L=tools/hw_r5_logs
mkdir -p "$L"
NEED=9
for i in $(seq 1 30); do
  n=$(ls "$L"/*.done 2>/dev/null | wc -l)
  if [ "$n" -ge "$NEED" ]; then
    echo "retry loop: all $n steps done ($(date))" >> "$L/driver.log"
    exit 0
  fi
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" >/dev/null 2>&1; then
    echo "retry $i: tunnel UP, $n/$NEED done ($(date))" >> "$L/driver.log"
    bash tools/hw_round5.sh
  else
    echo "retry $i: tunnel down ($(date))" >> "$L/driver.log"
    sleep 60
  fi
done
exit 1
