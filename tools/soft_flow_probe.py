"""Probe: decoder fit vs forced-flow harshness (viscosity sweep).

F2_POSTMORTEM.md's alternative decoder lever: the f2/f3 forced regime
(nu=1e-3, k_f=6) carries energy to the dealias cutoff and the SIREN
decoder plateaus at train rMAE ~0.2-0.3 — at/above the conditional
acceptance bar.  The reference's own cases (channel flow, periodic hills,
ConditionalNeuralField/README training cases) are far smoother fields.
This probe sweeps viscosity at fixed forcing/drag, checks that the flow
stays statistically stationary (energy drift over the snapshot horizon),
and runs a SHORT decoder fit on each candidate so the f3 regime is chosen
on measured decoder headroom, not guesses.

Usage: python tools/soft_flow_probe.py [--epochs 400]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.demo_turbulence import FLOW_PRESETS, simulate_turbulence  # noqa: E402

CANDIDATES = {
    "nu1e-3": dict(nu=1e-3),   # f2/f3 control regime
    "nu2e-3": dict(nu=2e-3),
    "nu4e-3": dict(nu=4e-3),
}


def stats(fields: np.ndarray) -> dict:
    """Stationarity + roughness diagnostics over (traj, T, n, n, 2)."""
    energy = 0.5 * (fields ** 2).sum(-1).mean((-1, -2))    # (traj, T)
    e_mean = energy.mean(0)
    half = len(e_mean) // 2
    drift = float(e_mean[half:].mean() / max(e_mean[:half].mean(), 1e-9))
    # spectral tail: fraction of KE above k=10 (the part SIREN struggles on)
    u_hat = np.fft.fft2(fields[..., 0], axes=(-2, -1))
    v_hat = np.fft.fft2(fields[..., 1], axes=(-2, -1))
    ke = (np.abs(u_hat) ** 2 + np.abs(v_hat) ** 2)
    n = fields.shape[-2]
    k = np.fft.fftfreq(n, 1.0 / n)
    kx, ky = np.meshgrid(k, k, indexing="ij")
    kk = np.sqrt(kx ** 2 + ky ** 2)
    tail = float(ke[..., kk > 10].sum() / ke.sum())
    return {
        "energy_mean": float(e_mean.mean()),
        "energy_drift_2nd_half_over_1st": round(drift, 3),
        "u_absmax": float(np.abs(fields).max()),
        "ke_frac_above_k10": round(tail, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--n-traj", type=int, default=4)
    ap.add_argument("--n-snap", type=int, default=96)
    ap.add_argument("--out", default="/tmp/soft_flow_probe")
    ap.add_argument("--skip-fit", action="store_true")
    args = ap.parse_args()

    preset = dict(FLOW_PRESETS["forced"])
    results = {}
    for name, ov in CANDIDATES.items():
        d = os.path.join(args.out, name)
        os.makedirs(d, exist_ok=True)
        foi_p = os.path.join(d, "fois.npy")
        if not os.path.exists(foi_p):
            fields = simulate_turbulence(
                n=64, n_snapshots=args.n_snap, n_traj=args.n_traj,
                seed=0, **{**preset, **ov})
            results[name] = stats(fields)
            n = fields.shape[-2]
            flat = fields.reshape(fields.shape[0] * fields.shape[1],
                                  n * n, 2)
            np.save(foi_p, flat)
            xs = np.linspace(0, 1, n)
            xx, yy = np.meshgrid(xs, xs, indexing="ij")
            np.save(os.path.join(d, "coords.npy"),
                    np.stack([xx, yy], -1).reshape(-1, 2)
                    .astype(np.float32))
        else:
            flat = np.load(foi_p)
            n = int(np.sqrt(flat.shape[1]))
            results[name] = stats(
                flat.reshape(args.n_traj, -1, n, n, 2))
        print(f"{name}: {results[name]}", flush=True)

    if not args.skip_fit:
        for name in CANDIDATES:
            d = os.path.join(args.out, name)
            r = subprocess.run(
                [sys.executable, "tools/cnf_cadence_probe.py",
                 "--data", d, "--epochs", str(args.epochs),
                 "--configs", "batch_w384_l6",
                 "--out", os.path.join(d, "fit")],
                capture_output=True, text=True, timeout=3600)
            print(r.stdout[-2000:], r.stderr[-500:] if r.returncode else "",
                  flush=True)
            pj = os.path.join(d, "fit", "probe.json")
            if os.path.exists(pj):
                with open(pj) as f:
                    results[name]["fit"] = json.load(f)["batch_w384_l6"]

    with open(os.path.join(args.out, "probe.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
