"""Integral-timescale CLI (reference ``Analysis/calculate_integral_timescale.py``):
spatially-averaged temporal autocorrelation of a velocity component,
integrated (trapezoid) to the 0.05-crossing / first minimum.

Reads Dedalus-style HDF5 (``tasks/<field>``) or a plain .npy of shape
(time, *space) / (time, components, *space).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from confild_tpu.analysis.metrics import (autocorr_cutoff, integral_timescale,
                                          temporal_autocorrelation)


def load_field(path: str, field: str, u_component: int,
               step_cutoff: int) -> np.ndarray:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.h5")))
        if not files:
            raise FileNotFoundError(f"no .h5 files in {path}")
        import h5py
        with h5py.File(files[0], "r") as f:
            data = f[f"tasks/{field}"][()]
    elif path.endswith(".h5"):
        import h5py
        with h5py.File(path, "r") as f:
            data = f[f"tasks/{field}"][()]
    else:
        data = np.load(path)

    if data.shape[0] <= step_cutoff:
        raise ValueError(f"need more than {step_cutoff} timesteps, "
                         f"got {data.shape[0]}")
    data = data[data.shape[0] - (data.shape[0] - step_cutoff):]
    if data.ndim == 4:  # (time, components, y, x)
        data = data[:, u_component]
    return data


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", required=True,
                   help="HDF5 dir / .h5 file / .npy file")
    p.add_argument("--output-dt", type=float, required=True)
    p.add_argument("--field", default="velocity")
    p.add_argument("--step-cutoff", type=int, default=0)
    p.add_argument("--u-component", type=int, default=0)
    args = p.parse_args(argv)

    u = load_field(args.output_dir, args.field, args.u_component,
                   args.step_cutoff)
    ac = temporal_autocorrelation(u)
    cutoff = autocorr_cutoff(ac)
    tau = integral_timescale(u, args.output_dt)
    steps = int(tau // args.output_dt + 1)
    print(f"cutoff index: {cutoff}")
    print(f"integral timescale: {tau:.6f} s (~ {steps} steps)")
    return tau


if __name__ == "__main__":
    main()
