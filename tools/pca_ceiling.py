#!/usr/bin/env python
"""Linear (POD/PCA) reconstruction ceiling for the demo dataset.

Answers the question the f3 postmortem left open: is the auto-decoder's
held-out oracle-fit rMAE (~0.44) an information-theoretic limit of a
256-dim code trained on this data, or a decoder-training artifact?

Method: top-k POD modes of the training snapshots (randomized SVD, two
power iterations), then project a fresh-seed held-out trajectory onto the
modes.  A linear code of the SAME dimension fit on the SAME data is a
lower bound on what the (strictly more expressive) SIREN auto-decoder
should reach with a well-generalizing latent space.

Measured (f3 data, 2026-08-20): train rMAE 0.106, held-out 0.227 — the f3
decoder's 0.444 held-out oracle is 2x worse than linear, so the latent
space (not the code size) is the binding constraint.  CPU-only, ~4 min.

Usage: python tools/pca_ceiling.py [--out examples/demo_out_f3]
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/demo_out_f3")
    ap.add_argument("--k", type=int, default=256,
                    help="match the demo's latent dim")
    ap.add_argument("--seed", type=int, default=777,
                    help="held-out simulation seed (training used 0)")
    ap.add_argument("--json-out", default="examples/pca_ceiling.json")
    ap.add_argument("--dump-latents", default=None,
                    help="also save the training rows' POD coefficients "
                         "(energy-ordered, globally scaled to rms 0.3 — the "
                         "measured converged latent-table scale) as an .npy "
                         "latent_init table for CNFTrainer")
    args = ap.parse_args()

    from examples.demo_turbulence import FLOW_PRESETS, simulate_turbulence

    out = os.path.join(REPO, args.out)
    with open(os.path.join(out, "demo_metrics.json")) as f:
        c = json.load(f)["config"]
    X = np.load(os.path.join(out, "fois.npy"), mmap_mode="r")
    n, npts, nc = X.shape
    Xf = np.asarray(X).reshape(n, npts * nc).astype(np.float32)
    mu = Xf.mean(0, keepdims=True)
    Xc = Xf - mu

    rng = np.random.default_rng(0)
    k, p = args.k, 40
    Y = Xc @ rng.normal(size=(Xc.shape[1], k + p)).astype(np.float32)
    for _ in range(2):
        Y = Xc @ (Xc.T @ Y)
    Q, _ = np.linalg.qr(Y)
    _, s, Vt = np.linalg.svd(Q.T @ Xc, full_matrices=False)
    V = Vt[:k].T

    n_snap = c.get("window") or c["n_snap"]
    held = simulate_turbulence(c["grid"], n_snap, 1, seed=args.seed,
                               **FLOW_PRESETS[c.get("flow", "decaying")])
    H = held.reshape(-1, npts * nc).astype(np.float32)

    if args.dump_latents:
        coeffs = Xc @ V                       # (n, k)
        rms = float(np.sqrt((coeffs ** 2).mean()))
        np.save(args.dump_latents, (coeffs * (0.3 / rms)).astype(np.float32))
        print(f"dumped latent init {coeffs.shape} (rms 0.3) "
              f"-> {args.dump_latents}")

    rep = {"run_dir": os.path.basename(out), "k": k, "seed": args.seed,
           "train_explained_var": float((s[:k] ** 2).sum() / (Xc ** 2).sum())}
    for tag, A in (("train", Xf[:256]), ("held", H)):
        Ac = A - mu
        R = Ac - (Ac @ V) @ V.T
        err = np.abs(R).reshape(-1, npts, nc).mean(axis=(0, 1))
        den = np.abs(A.reshape(-1, npts, nc)).mean(axis=(0, 1))
        rep[f"{tag}_rmae"] = float((err / den).mean())
    with open(os.path.join(REPO, args.json_out), "w") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
