#!/bin/bash
# TPU-recovery watchdog. The axon tunnel occasionally wedges: device
# enumeration works but any compute RPC blocks forever. Probe with a tiny
# bounded matmul every 5 min; when the chip answers, relaunch the round-3
# evidence queue (tools/r3_queue.sh). Logs to /tmp/tpu_watch.log.
set -u
cd /root/repo
LOG=/tmp/tpu_watch.log
echo "== watchdog start $(date -u +%H:%M:%S)" >> "$LOG"
for i in $(seq 1 96); do
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
(x @ x).block_until_ready()
print('alive')
" >> "$LOG" 2>&1
  rc=$?
  echo "probe $i rc=$rc $(date -u +%H:%M:%S)" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "TPU alive — launching queue" >> "$LOG"
    rm -f /tmp/run.pid
    exec bash tools/r3_queue.sh
  fi
  sleep 300
done
echo "watchdog gave up after 8h $(date -u +%H:%M:%S)" >> "$LOG"
