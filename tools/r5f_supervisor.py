#!/usr/bin/env python
"""Round-5 reboot-rebuild queue: regenerate the f4 evidence pipeline.

The round-5 VM reboot destroyed every run artifact the gitignore excludes
(stage-1 decoder checkpoints, the 30k-step prior, fois.npy) — only the
committed JSON evidence and the PCA latent-init table survived.  This
queue rebuilds the f4 pipeline from the committed state with trimmed but
probe-calibrated budgets:

* stage 1 at 1250 epochs — exactly the decoder-reg probe's winning
  PCA-seeded arm (examples/decoder_reg_probe.json: held-out oracle
  0.4217), seeded from the committed pca_latents_init.npy;
* stage 2 at 12500 steps (the 30k prior passed the round-trip probe at
  0.22-0.26 rel-L2 with 4-5.7x headroom over the structureless-Gaussian
  bound — the probe re-accepts or rejects the shorter prior);
* then the round-trip acceptance probe, the 128-sensor conditional DPS
  experiment, and the n_gen-256 quality report.

Same wedge-recovery machinery as tools/r4_supervisor.py.

Usage: R5_STALL_S=420 nohup python tools/r5f_supervisor.py \
           > /tmp/r5f_sup.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import r4_supervisor as sup
from r4_supervisor import log, run_step

sup.LOG = LOG = "/tmp/r5_queue.log"

F4 = "examples/demo_out_f4"

PIPE_ARGS = [
    "--flow", "forced_soft", "--out", F4,
    "--n-traj", "16", "--n-snap", "384",
    "--window", "64", "--window-stride", "4",
    "--latent", "256", "--hidden", "384", "--nf-layers", "6",
    "--nf-cadence", "batch",
    "--cnf-epochs", "1250", "--latent-lr-end", "1e-4",
    "--nf-lr-end", "3e-5",
    "--cnf-run-dir", "cnf_run",
    "--diff-steps", "12500", "--diff-batch", "64",
    "--scale-sigmas", "2.5",
    "--unet-channels", "96", "--unet-mult", "1,1,2,2,4",
    "--latent-init", os.path.join(F4, "pca_latents_init.npy"),
]

STEPS = [
    (
        "f4 rebuild pipeline (PCA-seeded 1250-epoch decoder + 12.5k prior)",
        14400, 8,
        [sys.executable, "-u", "examples/demo_turbulence.py"] + PIPE_ARGS,
        [F4],
    ),
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
        "f4 quality report (n_gen 256, 1000 steps) [segmented]",
        10800, 4,
        [sys.executable, "-u", "examples/demo_report.py", "--out", F4,
         "--n-gen", "256", "--sample-steps", "1000"],
        [F4, "examples/demo_report.json"],
    ),
]


def main():
    stall_s = int(os.environ.get("R5_STALL_S", "420"))
    log(f"r5f supervisor start (stall threshold {stall_s}s)")
    for name, timeout_s, retries, cmd, watch in STEPS:
        ok = run_step(name, timeout_s, retries, cmd, watch, stall_s)
        log(f"{name}: {'ok' if ok else 'FAILED — moving on'}")
    log("queue done (r5f supervisor)")


if __name__ == "__main__":
    main()
