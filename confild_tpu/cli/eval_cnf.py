"""CNF evaluation CLI (reference ``Analysis/cnf_inference_pub.py`` /
``cnf_inference_mhd.py``): spot-check predictions vs ground truth and compute
per-channel MSE / rMAE over the full snapshot set.
"""

from __future__ import annotations

import argparse

import numpy as np

from confild_tpu.analysis.metrics import per_channel_mse, per_channel_rmae
from confild_tpu.inference import CNF_inference


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--coords", default=None,
                   help=".npy coordinate file; unit grid inferred otherwise")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-snapshots", type=int, default=None)
    p.add_argument("--is-pub", action="store_true")
    args = p.parse_args(argv)

    inf = CNF_inference(args.checkpoint, args.config, args.data,
                        is_pub=args.is_pub)
    data = inf.data
    n = args.num_snapshots or data.shape[0]
    data = data[:n]

    if args.coords:
        coords = np.load(args.coords)
    else:
        coords = inf.create_coordinates_grid()
    flat_coords = coords.reshape(-1, coords.shape[-1])

    pred = inf.predict(flat_coords, list(range(n)), args.batch_size)
    pred = pred.reshape(n, *data.shape[1:])

    mse = per_channel_mse(pred, data)
    rmae = per_channel_rmae(pred.reshape(n, -1, data.shape[-1]),
                            data.reshape(n, -1, data.shape[-1]))
    for k in range(data.shape[-1]):
        print(f"channel {k}: MSE {mse[k]:.6e}  rMAE {rmae[k]:.6e}")
    return mse, rmae


if __name__ == "__main__":
    main()
