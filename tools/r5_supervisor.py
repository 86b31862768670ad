#!/usr/bin/env python
"""Round-5 evidence-queue supervisor.

Step 1 decides the f4 decoder recipe: the f3 conditional evidence localized
the remaining failure to the auto-decoded latent space (held-out oracle fit
rMAE 0.43 vs train 0.069; in-distribution sensor control at field rMAE 0.89
with sensors matched at 0.017), so the probe A/Bs the new latent-space
regularizers (``latent_noise_std`` / ``latent_l2``, cnf_trainer.py) on the
metric that is blocking everything: held-out oracle rMAE.

Later steps (full f4 pipeline + conditional evidence) are appended once the
probe picks a winner — run the supervisor again; completed steps are
detected by their output artifacts and skipped.

Same wedge-recovery machinery as tools/r4_supervisor.py (the axon tunnel
occasionally blocks a victim process forever; children are watched via
CPU-tick + output-mtime liveness and retried; every step resumes from its
own checkpoints or is idempotent).

Usage: nohup python tools/r5_supervisor.py > /tmp/r5_sup.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import r4_supervisor as sup
from r4_supervisor import log, run_step

sup.LOG = LOG = "/tmp/r5_queue.log"

OUT = "examples/demo_out_f3"

STEPS = [
    (
        "decoder latent-regularization probe (5 arms, held-out oracle rMAE)",
        21600,
        8,
        [sys.executable, "-u", "tools/decoder_reg_probe.py",
         "--out", OUT, "--epochs", "1250",
         # 3 decisive arms first (~35 min each at the measured 40 ep/min);
         # n15/l2 are spare-TPU-time follow-ups
         "--arms", "base,n05,n05_l2",
         "--json-out", "examples/decoder_reg_probe.json"],
        ["/tmp/regprobe", "examples/decoder_reg_probe.json"],
    ),
]


def main():
    stall_s = int(os.environ.get("R5_STALL_S", "900"))
    log(f"r5 supervisor start (stall threshold {stall_s}s)")
    for name, timeout_s, retries, cmd, watch in STEPS:
        ok = run_step(name, timeout_s, retries, cmd, watch, stall_s)
        log(f"{name}: {'ok' if ok else 'FAILED — moving on'}")
    log("queue done (r5 supervisor)")


if __name__ == "__main__":
    main()
