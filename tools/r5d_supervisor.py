#!/usr/bin/env python
"""Round-5 remainder queue: the f4 evidence steps AFTER the pipeline.

The full r5 queue reruns demo_turbulence's stage 4/5 (~12 min of
sampling) on every supervisor restart even when dckpt is complete; once
the pipeline step has gone rc=0 this remainder queue restarts cleanly at
the probe/evidence steps.  Also drops the wedge-detection stall window to
R5_STALL_S=420 — the round-trip probe wedge (11:14) showed a blocked RPC
dripping ~0.1 CPU ticks/s, which resets the 50-tick liveness test every
~8 min and defeats a 900 s window.

Usage: R5_STALL_S=420 nohup python tools/r5d_supervisor.py \
           > /tmp/r5d_sup.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import r4_supervisor as sup
from r4_supervisor import log, run_step

sup.LOG = LOG = "/tmp/r5_queue.log"

F4 = "examples/demo_out_f4"

STEPS = [
    (
        "f4 prior round-trip acceptance probe",
        3600, 4,
        [sys.executable, "-u", "tools/prior_roundtrip.py", "--out", F4],
        [F4],
    ),
    (
        "f4 conditional DPS experiment (128 sensors, 3.1% coverage)",
        10800, 4,
        [sys.executable, "-u", "examples/demo_conditional.py",
         "--out", F4, "--n-sensors", "128",
         "--sensor-sweep", "10,100,200"],
        [F4, "examples/demo_conditional.json"],
    ),
    (
        "f4 quality report (n_gen 256, 1000 steps)",
        10800, 4,
        [sys.executable, "-u", "examples/demo_report.py", "--out", F4,
         "--n-gen", "256", "--sample-steps", "1000"],
        [F4, "examples/demo_report.json"],
    ),
]


def main():
    stall_s = int(os.environ.get("R5_STALL_S", "420"))
    log(f"r5d supervisor start (stall threshold {stall_s}s)")
    for name, timeout_s, retries, cmd, watch in STEPS:
        ok = run_step(name, timeout_s, retries, cmd, watch, stall_s)
        log(f"{name}: {'ok' if ok else 'FAILED — moving on'}")
    log("queue done (r5d supervisor)")


if __name__ == "__main__":
    main()
