"""Decoder-induced physics ceilings of a demo CNF run.

The end-to-end quality gates (generated-spectra error, integral-timescale
ratio) are bounded by the CNF decoder: generated latents decode through
the same SIREN as the training reconstructions, so the reconstruction's
own timescale ratio is the ceiling any diffusion fit can reach.  Measured
2026-08-18 on the demo runs: the latent-64 decoder caps the ratio at
~0.93 (per-batch latent-Adam jitter adds white temporal noise), while the
latent-128 run with cosine latent-lr decay reaches ~0.995 — removing the
decoder as the binding constraint for the >=0.95 BASELINE gate.

Usage: CONFILD_FORCE_CPU=1 python tools/decoder_ceiling.py \
           [--out examples/demo_out] [--n-traj 6]
Appends a per-run entry to examples/decoder_ceiling.json.
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/demo_out")
    ap.add_argument("--n-traj", type=int, default=6)
    args = ap.parse_args()

    import jax
    if os.environ.get("CONFILD_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from confild_tpu import config as cfg
    from confild_tpu.analysis.metrics import (integral_timescale,
                                              spectra_relative_error)
    from confild_tpu.train.cnf_trainer import CNFTrainer

    out = args.out
    with open(os.path.join(out, "demo_metrics.json")) as f:
        c = json.load(f)["config"]
    n_snap, grid = c["n_snap"], c["grid"]

    hp = cfg.basic_input(os.path.join(out, "cnf.yml"))
    tr = CNFTrainer(hp)
    tr.load(-1)
    flat = np.load(os.path.join(out, "fois.npy"))

    ratios, spec_errs = [], []
    for i in range(args.n_traj):
        sl = slice(i * n_snap, (i + 1) * n_snap)
        recon = np.asarray(tr.infer(tr.train_coord, tr.state.latents[sl]))
        rg = recon.reshape(n_snap, grid, grid, 2)
        tg = flat[sl].reshape(n_snap, grid, grid, 2)
        ratios.append(integral_timescale(rg[..., 0], 1.0)
                      / integral_timescale(tg[..., 0], 1.0))
        spec_errs.append(spectra_relative_error(
            rg[..., 0].reshape(-1, grid), tg[..., 0].reshape(-1, grid),
            axis=-1))
        print(f"traj {i}: timescale ratio {ratios[-1]:.4f}, "
              f"spectra err {spec_errs[-1]:.4f}")

    entry = {
        "run_dir": out,
        "config": c,
        "n_traj_evaluated": args.n_traj,
        "recon_timescale_ratio_mean": float(np.mean(ratios)),
        "recon_timescale_ratio_per_traj": [float(r) for r in ratios],
        "recon_spectra_error_mean": float(np.mean(spec_errs)),
    }
    path = os.path.join(REPO, "examples", "decoder_ceiling.json")
    data = []
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data = [e for e in data if e["run_dir"] != out] + [entry]
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
