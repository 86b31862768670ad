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
F4 = "examples/demo_out_f4"

# filled in from examples/decoder_reg_probe.json once step 1 lands; the f4
# stage-1 fine-tunes the winner's 1250-epoch run to 2500 total epochs
# (demo_turbulence resumes from the staged checkpoint)
WINNER = os.environ.get("R5_WINNER", "")
WINNER_KNOBS = {
    "n05": ["--latent-noise-std", "0.05"],
    "n15": ["--latent-noise-std", "0.15"],
    "n05_l2": ["--latent-noise-std", "0.05", "--latent-l2", "3e-3"],
    "l2": ["--latent-l2", "3e-3"],
    "pca": ["--latent-init", "/tmp/regprobe/pca_latents.npy"],
    "pca_n05": ["--latent-init", "/tmp/regprobe/pca_latents.npy",
                "--latent-noise-std", "0.05"],
    "base": [],
}

PROBE_STEP = (
    "decoder latent-regularization probe (3 arms, held-out oracle rMAE)",
    21600,
    8,
    [sys.executable, "-u", "tools/decoder_reg_probe.py",
     "--out", OUT, "--epochs", "1250",
     # 3 decisive arms first (~35 min each at the measured 40 ep/min);
     # n15/l2 are spare-TPU-time follow-ups
     "--arms", "base,n05,n05_l2",
     "--json-out", "examples/decoder_reg_probe.json"],
    ["/tmp/regprobe", "examples/decoder_reg_probe.json"],
)


def f4_steps(winner):
    cnf_args = [
        "--flow", "forced_soft", "--out", F4,
        "--n-traj", "16", "--n-snap", "384",
        "--window", "64", "--window-stride", "4",
        "--latent", "256", "--hidden", "384", "--nf-layers", "6",
        "--nf-cadence", "batch",
        "--cnf-epochs", "2500", "--latent-lr-end", "1e-4",
        "--nf-lr-end", "3e-5",
        "--cnf-run-dir", "cnf_run",
        "--diff-steps", "30000", "--diff-batch", "64",
        "--scale-sigmas", "2.5",
        "--unet-channels", "96", "--unet-mult", "1,1,2,2,4",
    ] + WINNER_KNOBS[winner]
    return [
        (
            f"f4 staging (probe winner {winner!r})",
            600, 2,
            [sys.executable, "-u", "tools/f4_prep.py", "--winner", winner],
            [F4],
        ),
        (
            "f4 pipeline (regularized decoder fine-tune + 96ch prior)",
            21600, 6,
            [sys.executable, "-u", "examples/demo_turbulence.py"] + cnf_args,
            [F4],
        ),
        (
            "f4 prior round-trip acceptance probe",
            3600, 3,
            [sys.executable, "-u", "tools/prior_roundtrip.py", "--out", F4],
            [F4],
        ),
        (
            "f4 conditional DPS experiment (128 sensors, 3.1% coverage)",
            10800, 3,
            [sys.executable, "-u", "examples/demo_conditional.py",
             "--out", F4, "--n-sensors", "128",
             "--sensor-sweep", "10,100,200"],
            [F4, "examples/demo_conditional.json"],
        ),
        (
            "f4 quality report (n_gen 256, 1000 steps)",
            10800, 3,
            [sys.executable, "-u", "examples/demo_report.py", "--out", F4,
             "--n-gen", "256", "--sample-steps", "1000"],
            [F4, "examples/demo_report.json"],
        ),
    ] + ([
        (
            "f4 respacing study (n_gen 128)",
            10800, 3,
            [sys.executable, "-u", "tools/respacing_study.py",
             "--out", F4, "--n-gen", "128"],
            [F4, "examples/demo_respacing.json"],
        ),
    ] if os.environ.get("R5_RESPACING") else [])


# once a winner is chosen the probe has served its purpose — rerunning it
# would retrain any arm missing from the JSON (the queue was trimmed mid-round)
STEPS = ([] if WINNER else [PROBE_STEP]) + (f4_steps(WINNER) if WINNER else [])


def main():
    stall_s = int(os.environ.get("R5_STALL_S", "900"))
    log(f"r5 supervisor start (stall threshold {stall_s}s)")
    for name, timeout_s, retries, cmd, watch in STEPS:
        ok = run_step(name, timeout_s, retries, cmd, watch, stall_s)
        log(f"{name}: {'ok' if ok else 'FAILED — moving on'}")
    log("queue done (r5 supervisor)")


if __name__ == "__main__":
    main()
