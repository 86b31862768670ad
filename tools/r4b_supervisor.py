#!/usr/bin/env python
"""Round-4b evidence-queue supervisor: the f3 retrain.

F2_POSTMORTEM.md round-5 plan, executed in round 4's extended window:
  1. decoder first — per-batch decoder cadence (nf_optim_cadence: batch,
     the probe-verified lever over the reference's per-epoch cadence) +
     capacity per tools/cnf_cadence_probe.py, fresh cnf run dir;
  2. then the prior — bigger demo UNet (persisted via dckpt/unet.json) and
     a longer stage-2 horizon on the refit latents;
  3. prior acceptance probe (tools/prior_roundtrip.py) BEFORE burning the
     conditional-experiment budget: training-window round trips at T/4
     discriminate a usable prior from the f2 failure mode;
  4. conditional DPS experiment + quality report + respacing study.

Same wedge-recovery machinery as tools/r4_supervisor.py (the axon tunnel
occasionally blocks a victim process forever; children are watched via
CPU ticks + output mtimes and retried on freeze — every step resumes from
its own checkpoints or is idempotent).

Usage: python tools/r4b_supervisor.py  (logs to /tmp/r4b_queue.log)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.r4_supervisor import run_step, log  # noqa: E402
import tools.r4_supervisor as sup  # noqa: E402

sup.LOG = LOG = "/tmp/r4b_queue.log"

OUT = "examples/demo_out_f3"

# recipe chosen by the probes:
#   - decoder: batch cadence + hidden 384 x 6 layers won the cadence probe
#     (/tmp/cnf_probe3: train rMAE 0.199 vs 0.288 epoch-cadence @600ep on
#     the full f2 set, loss still descending); w0 sweep ruled out
#   - flow: forced_soft (nu 4e-3) won the soft-flow probe 1.6x at equal
#     budget (tools/soft_flow_probe.py: rMAE 0.041 vs 0.065) and stays
#     stationary — the decoder underfit was f2's binding ceiling
#   - prior: 96ch 5-level UNet (persisted unet.json), 30k steps on the
#     device-resident data path
CNF_ARGS = [
    "--flow", "forced_soft", "--out", OUT,
    "--n-traj", "16", "--n-snap", "384",
    "--window", "64", "--window-stride", "4",
    "--latent", "256", "--hidden", "384", "--nf-layers", "6",
    "--nf-cadence", "batch",
    "--cnf-epochs", "5000", "--latent-lr-end", "1e-4",
    "--nf-lr-end", "3e-5",
    "--cnf-run-dir", "cnf_run",
    "--diff-steps", "30000", "--diff-batch", "64",
    "--scale-sigmas", "2.5",
    "--unet-channels", "96", "--unet-mult", "1,1,2,2,4",
]

STEPS = [
    (
        "f3 pipeline (batch-cadence decoder + 96ch 5-level prior)",
        28800,
        6,
        [sys.executable, "-u", "examples/demo_turbulence.py"] + CNF_ARGS,
        [OUT],
    ),
    (
        "prior round-trip acceptance probe (training windows)",
        3600,
        3,
        [sys.executable, "-u", "tools/prior_roundtrip.py", "--out", OUT],
        [OUT],
    ),
    (
        "conditional DPS experiment (f3 prior)",
        10800,
        3,
        [sys.executable, "-u", "examples/demo_conditional.py",
         "--out", OUT],
        [OUT],
    ),
    (
        "quality report on the f3 prior (n_gen 256, 1000 steps)",
        10800,
        3,
        [sys.executable, "-u", "examples/demo_report.py", "--out", OUT],
        [OUT, "examples/demo_report.json"],
    ),
    (
        "respacing study (f3, n_gen 128)",
        10800,
        3,
        [sys.executable, "-u", "tools/respacing_study.py",
         "--out", OUT, "--n-gen", "128"],
        [OUT, "examples/demo_respacing.json"],
    ),
]


def main():
    stall_s = int(os.environ.get("R3_STALL_S", "1500"))
    log(f"supervisor start (stall threshold {stall_s}s)")
    for name, timeout_s, retries, cmd, watch in STEPS:
        ok = run_step(name, timeout_s, retries, cmd, watch, stall_s)
        log(f"{name}: {'ok' if ok else 'FAILED — moving on'}")
    log("queue done (r4b supervisor)")


if __name__ == "__main__":
    main()
