"""Probe: stage-2 diffusion training step rate vs demo-UNet size.

Sizes the f3 prior against the wall-clock budget: the reference's case
recipes use a 128ch x 6-level ADM UNet (case4.yml) where the demo default
is 64ch x 3 levels — this measures warm steps/s per candidate on the real
latent-image shape so the retrain queue picks the biggest prior that fits
the evidence window.

Usage: python tools/diff_rate_probe.py [--window 64] [--latent 256]
           [--batch 64] [--steps 50]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = {
    "64ch_3lvl": dict(num_channels=64, channel_mult="1,2,2"),
    "96ch_4lvl": dict(num_channels=96, channel_mult="1,2,2,4"),
    "96ch_5lvl": dict(num_channels=96, channel_mult="1,1,2,2,4"),
    "128ch_5lvl": dict(num_channels=128, channel_mult="1,1,2,2,4"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--configs", default=",".join(CANDIDATES))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from confild_tpu.diffusion import create_gaussian_diffusion
    from confild_tpu.train.diffusion_trainer import TrainLoop
    from examples.demo_common import build_demo_unet

    diffusion = create_gaussian_diffusion(steps=1000, noise_schedule="cosine")
    rng = np.random.default_rng(0)
    dataset = rng.normal(scale=0.4, size=(
        1296, 1, args.window, args.latent)).astype(np.float32)

    results = {}
    for name in args.configs.split(","):
        kw = CANDIDATES[name]
        model = build_demo_unet(args.window, args.latent, **kw)
        loop = TrainLoop(model=model, diffusion=diffusion, data=None,
                         device_data=dataset,
                         batch_size=args.batch, lr=1e-4, ema_rate="0.999",
                         log_interval=10 ** 9, save_interval=10 ** 9,
                         lr_anneal_steps=10 ** 9,
                         steps_per_call=args.steps, save_dir="/tmp/dprobe")
        # first call compiles; the jitted multi-step is cached per loop object
        t0 = time.time()
        loop.run_steps(args.steps)
        _ = float(jnp.asarray(jax.tree.leaves(loop.state.params)[0]).sum())
        first = time.time() - t0
        t1 = time.time()
        loop.run_steps(args.steps)
        # force a real host read: block_until_ready returns early on the
        # tunnel (see .claude/skills/verify)
        _ = float(jnp.asarray(jax.tree.leaves(loop.state.params)[0]).sum())
        warm = time.time() - t1
        results[name] = {
            "first_call_s": round(first, 1),
            "warm_steps_per_s": round(args.steps / warm, 2),
        }
        print(f"{name}: warm {args.steps / warm:.2f} steps/s "
              f"(first call {first:.0f}s incl compile)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
