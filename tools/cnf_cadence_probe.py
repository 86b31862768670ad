"""Probe: decoder-cadence / lr / capacity sweep for the stage-1 CNF fit.

The f2 fit (hidden 256x4L, reference per-epoch decoder cadence, 16k epochs)
plateaued at train rMAE 0.30 on the forced flow — the decoder's own ceiling
sits right at the conditional acceptance bar (F2_POSTMORTEM.md).  This probe
runs SHORT fits on the SAME dataset under candidate configs and reports the
loss/rMAE trajectory per wall-clock, to pick the f3 stage-1 recipe without
burning hours on a guess.

Usage: python tools/cnf_cadence_probe.py --data examples/demo_out_f2 \
           --epochs 600 [--configs batch,epoch]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # name -> recipe overrides
    "epoch": dict(nf_optim_cadence="epoch"),
    "batch": dict(nf_optim_cadence="batch"),
    "batch_lr3": dict(nf_optim_cadence="batch", nf_lr=3e-4),
    "batch_w320": dict(nf_optim_cadence="batch", hidden=320, layers=5),
    "batch_w384_l6": dict(nf_optim_cadence="batch", hidden=384, layers=6),
    "batch_w0_60": dict(nf_optim_cadence="batch", w0=60.0),
    "batch_w0_90": dict(nf_optim_cadence="batch", w0=90.0),
    "batch_w0_60_lr3": dict(nf_optim_cadence="batch", w0=60.0, nf_lr=3e-4),
    "batch_w0_60_l6": dict(nf_optim_cadence="batch", w0=60.0, layers=6),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="examples/demo_out_f2")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--configs", default="epoch,batch,batch_lr3")
    ap.add_argument("--out", default="/tmp/cnf_cadence_probe")
    args = ap.parse_args()

    import yaml

    from confild_tpu import config as cfg
    from confild_tpu.analysis.metrics import per_channel_rmae
    from confild_tpu.train.cnf_trainer import CNFTrainer

    results = {}
    for name in args.configs.split(","):
        ov = CONFIGS[name]
        run = os.path.join(args.out, name)
        shutil.rmtree(run, ignore_errors=True)
        os.makedirs(run, exist_ok=True)
        recipe = {
            "data_path": os.path.join(args.data, "fois.npy"),
            "coor_path": os.path.join(args.data, "coords.npy"),
            "save_path": run,
            "lumped_latent": True,
            "normalizer": {"method": "-11", "dim": 0},
            "batch_size": 128, "test_batch_size": 64, "multiGPU": 1,
            "readin_data_shape": "t N c", "batch_shape": "t N c",
            "hidden_size": args.latent, "epochs": args.epochs,
            "loss_fn": "MSELoss", "test_criteria": "rMAE",
            "save_every": max(args.epochs // 3, 1), "dims": 2,
            "NF": {"name": "SIRENAutodecoder_film",
                   "num_hidden_layers": ov.get("layers", 4),
                   "out_features": 2,
                   "hidden_features": ov.get("hidden", 256),
                   **({"omega_0": ov["w0"]} if "w0" in ov else {})},
            "lr": {"nf": ov.get("nf_lr", 1e-4), "latents": 1e-2},
            "nf_optim_cadence": ov.get("nf_optim_cadence", "epoch"),
        }
        yml = os.path.join(run, "case.yml")
        with open(yml, "w") as f:
            yaml.safe_dump(recipe, f)
        hp = cfg.basic_input(yml)
        tr = CNFTrainer(hp)
        t0 = time.time()
        tr.train(log_formats=())
        wall = time.time() - t0
        _, eval_rmae, _ = tr._train_fns
        rmae = [float(x) for x in np.asarray(eval_rmae(tr.state))]
        import csv
        with open(os.path.join(run, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        losses = [float(r["loss"]) for r in rows if r.get("loss")]
        results[name] = {
            "train_rmae": rmae, "wall_s": round(wall, 1),
            "epochs_per_s": round(args.epochs / wall, 3),
            "loss_first": losses[0] if losses else None,
            "loss_last": losses[-1] if losses else None,
        }
        print(f"{name}: rMAE {rmae}, {wall:.0f}s "
              f"({args.epochs / wall:.2f} eps/s), "
              f"loss {losses[0]:.4f} -> {losses[-1]:.5f}", flush=True)
    out = os.path.join(args.out, "probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
