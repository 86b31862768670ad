#!/usr/bin/env python
"""Round-5 final evidence queue: the f4 conditional retry (segmented
oracle fit, worker-crash-retryable supervisor) followed by the full f5
prior-coverage-expansion track.

Launch after the f4 quality report releases the chip.

Usage: R5_STALL_S=900 nohup python tools/r5e_supervisor.py \
           > /tmp/r5e_sup.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import r4_supervisor as sup
from r4_supervisor import log, run_step

sup.LOG = LOG = "/tmp/r5_queue.log"

F4 = "examples/demo_out_f4"
F5 = "examples/demo_out_f5"

STEPS = [
    (
        "f4 conditional DPS experiment (128 sensors, 3.1% coverage) [retry]",
        10800, 4,
        [sys.executable, "-u", "examples/demo_conditional.py",
         "--out", F4, "--n-sensors", "128",
         "--sensor-sweep", "10,100,200"],
        [F4, "examples/demo_conditional.json"],
    ),
    (
        "f4 quality report (n_gen 256, 1000 steps) [segmented]",
        10800, 4,
        [sys.executable, "-u", "examples/demo_report.py", "--out", F4,
         "--n-gen", "256", "--sample-steps", "1000"],
        [F4, "examples/demo_report.json"],
    ),
    (
        "f5 latent fits (48 extra trajectories, frozen f4 decoder)",
        7200, 8,
        [sys.executable, "-u", "tools/f5_expand_prior.py", "fit"],
        [F5],
    ),
    (
        "f5 prior retrain (64-traj window set, 30k steps)",
        21600, 8,
        [sys.executable, "-u", "tools/f5_expand_prior.py", "train"],
        [F5],
    ),
    (
        "f5 run-dir staging",
        600, 2,
        [sys.executable, "-u", "tools/f5_expand_prior.py", "stage"],
        [F5],
    ),
    (
        "f5 prior round-trip acceptance probe",
        3600, 4,
        [sys.executable, "-u", "tools/prior_roundtrip.py", "--out", F5],
        [F5],
    ),
    (
        "f5 conditional DPS experiment (128 sensors)",
        10800, 4,
        [sys.executable, "-u", "examples/demo_conditional.py",
         "--out", F5, "--n-sensors", "128",
         "--sensor-sweep", "10,100,200"],
        [F5, "examples/demo_conditional.json"],
    ),
    (
        "f5 quality report (n_gen 256, 1000 steps)",
        10800, 4,
        [sys.executable, "-u", "examples/demo_report.py", "--out", F5,
         "--n-gen", "256", "--sample-steps", "1000"],
        [F5, "examples/demo_report.json"],
    ),
]


def main():
    stall_s = int(os.environ.get("R5_STALL_S", "900"))
    log(f"r5e supervisor start (stall threshold {stall_s}s)")
    for name, timeout_s, retries, cmd, watch in STEPS:
        ok = run_step(name, timeout_s, retries, cmd, watch, stall_s)
        log(f"{name}: {'ok' if ok else 'FAILED — moving on'}")
    log("queue done (r5e supervisor)")


if __name__ == "__main__":
    main()
