#!/bin/bash
# Round-3 TPU evidence queue. Run AFTER the long demo_turbulence run (PID in
# /tmp/run.pid or given as $1) exits; each step appends to /tmp/r3_queue.log.
# Steps are independent: a failure moves on to the next.
set -u
PID=${1:-$(cat /tmp/run.pid 2>/dev/null || echo)}
if [ -n "$PID" ]; then
  echo "waiting for PID $PID to exit..." >> /tmp/r3_queue.log
  while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
cd /root/repo
log() { echo "== $(date -u +%H:%M:%S) $*" >> /tmp/r3_queue.log; }

log "windowed stage-2 run (decoder reuse from r3): 32 traj x 256 snaps, window 64 stride 4"
timeout 14400 python -u examples/demo_turbulence.py --out examples/demo_out_w \
  --n-traj 32 --n-snap 256 --window 64 --window-stride 4 --latent 128 \
  --decoder-from examples/demo_out_r3/cnf_run --fix-nf-epochs 6000 \
  --cnf-epochs 0 --latent-lr-end 1e-4 --diff-steps 30000 --diff-batch 64 \
  >> /tmp/r3_queue.log 2>&1
log "windowed run rc=$?"

log "conditional DPS experiment on the windowed prior"
timeout 10800 python -u examples/demo_conditional.py --out examples/demo_out_w \
  >> /tmp/r3_queue.log 2>&1
log "conditional rc=$?"

log "bench"
timeout 3600 python -u bench.py >> /tmp/r3_queue.log 2>&1
log "bench rc=$?"

log "respacing study (r3 run, n_gen 256; final row leaves demo_report.json at 1000 steps)"
timeout 10800 python -u tools/respacing_study.py --out examples/demo_out_r3 \
  --n-gen 256 >> /tmp/r3_queue.log 2>&1
log "respacing rc=$?"

log "xl smoke (flash-attention gradient path at 768^2, reduced width)"
timeout 3600 python -u tools/xl_smoke.py >> /tmp/r3_queue.log 2>&1
log "xl smoke rc=$?"
log "queue done"
