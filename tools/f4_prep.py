#!/usr/bin/env python
"""Stage the f4 run dir from the f3 data + the decoder-reg probe winner.

The f4 pipeline fine-tunes the probe winner's 1250-epoch regularized
decoder to the full stage-1 horizon instead of retraining from scratch
(saves ~1.3 h of single-chip time): demo_turbulence.py resumes stage 1
from the newest checkpoint under cnf_run/ and then trains the diffusion
prior into the fresh dckpt/.

Idempotent: skips anything already staged.

Usage: python tools/f4_prep.py --winner n05 [--src examples/demo_out_f3]
"""
import argparse
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--winner", required=True,
                    help="probe arm name under /tmp/regprobe")
    ap.add_argument("--src", default="examples/demo_out_f3")
    ap.add_argument("--dst", default="examples/demo_out_f4")
    ap.add_argument("--probe-work", default="/tmp/regprobe")
    args = ap.parse_args()

    src = os.path.join(REPO, args.src)
    dst = os.path.join(REPO, args.dst)
    run = os.path.join(dst, "cnf_run")
    os.makedirs(run, exist_ok=True)

    # the simulation is deterministic (seed 0): f4 trains on the same data
    for name in ("fois.npy", "coords.npy", "sim_meta.json"):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if not os.path.exists(d):
            shutil.copy(s, d)
            print(f"staged {name}")

    wrun = os.path.join(args.probe_work, args.winner, "run")
    ckpts = sorted(f for f in os.listdir(wrun)
                   if f.startswith("checkpoint_"))
    if not ckpts:
        raise SystemExit(f"no checkpoints under {wrun}")
    newest = max(ckpts, key=lambda f: int(f.split("_")[1].split(".")[0]))
    for name in (newest, "normalizer_params.ckpt"):
        d = os.path.join(run, name)
        if not os.path.exists(d):
            shutil.copy(os.path.join(wrun, name), d)
            print(f"staged cnf_run/{name}")
    print(f"f4 staged from probe arm {args.winner!r} at {newest}")


if __name__ == "__main__":
    main()
