#!/usr/bin/env python
"""Early go/no-go for the f2 conditional bet, runnable BEFORE stage 2 ends.

The r3 conditional failure decomposed into (a) held-outs out of decoder
range (decaying flow: oracle rMAE 0.41) and (b) prior under-dispersion
(min-max latent scaling).  This probe answers (a) for the f2 run using
only the finished stage-1 CNF: fit oracle latents for fresh-seed FORCED
held-out windows against the frozen latent-256 decoder, and report where
those latents sit relative to the training-latent distribution and the
persisted diffusion image scale.  oracle rMAE near the training recon
rMAE (~0.23) = held-outs are in decoder range and DPS can work; ~0.4+ =
the f2 bet fails regardless of how long stage 2 trains.

Usage: timeout 900 python tools/f2_oracle_probe.py [--out examples/demo_out_f2]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/demo_out_f2")
    ap.add_argument("--n-held", type=int, default=2)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--fit-steps", type=int, default=600,
                    help="latent-only Adam steps (demo_conditional uses 600; "
                         "raise to test for under-convergence)")
    ap.add_argument("--fit-lr", type=float, default=1e-2)
    ap.add_argument("--cosine", action="store_true",
                    help="cosine-decay the fit lr to 1e-4 (the f2 stage-1 "
                         "latent-lr-end recipe)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from examples.demo_turbulence import FLOW_PRESETS, simulate_turbulence
    from confild_tpu import config as cfg
    from confild_tpu.analysis.metrics import per_channel_rmae
    from confild_tpu.train.cnf_trainer import CNFTrainer

    out = os.path.join(REPO, args.out)
    with open(os.path.join(out, "sim_meta.json")) as f:
        meta = json.load(f)
    grid = meta.get("grid", 64)
    window = 64  # f2 window size (diffusion image time-length)

    flow = meta.get("flow", "forced")
    t0 = time.time()
    print(f"[1/3] simulating {args.n_held} held-out {flow} windows ...")
    held = simulate_turbulence(grid, window, args.n_held, seed=args.seed,
                               **FLOW_PRESETS[flow])
    held_flat = held.reshape(args.n_held, window, grid * grid, 2)

    print(f"[2/3] loading f2 stage-1 CNF ... ({time.time()-t0:.0f}s)")
    hp = cfg.basic_input(os.path.join(out, "cnf.yml"))
    tr = CNFTrainer(hp, infer_mode=True, infer_dps=True)
    tr.load(-1)
    latents_train = np.asarray(tr.state.latents)
    latent = latents_train.shape[-1]
    try:
        mx = float(np.load(os.path.join(out, "dckpt", "data_max.npy")))
        mn = float(np.load(os.path.join(out, "dckpt", "data_min.npy")))
    except FileNotFoundError:
        mx, mn = float(latents_train.max()), float(latents_train.min())

    full_coords = np.stack(np.meshgrid(np.linspace(0, 1, grid),
                                       np.linspace(0, 1, grid),
                                       indexing="ij"), -1).reshape(-1, 2)
    full_coords = full_coords.astype(np.float32)
    xn_full = tr.in_normalizer.as_jax().normalize(jnp.asarray(full_coords))
    ynorm_jax = tr.out_normalizer.as_jax()
    nf_params = tr.state.nf_params
    if args.cosine:
        sched = optax.cosine_decay_schedule(args.fit_lr, args.fit_steps,
                                            alpha=1e-4 / args.fit_lr)
        opt = optax.adam(sched)
    else:
        opt = optax.adam(args.fit_lr)

    @jax.jit
    def fit_oracle(y_target):
        yn = ynorm_jax.normalize(y_target)
        z0 = jnp.zeros((y_target.shape[0], latent), jnp.float32)

        def loss_fn(z):
            pred = tr.model(nf_params, xn_full, z[:, None, :])
            return jnp.mean((pred - yn) ** 2)

        def step(carry, _):
            z, ost = carry
            g = jax.grad(loss_fn)(z)
            up, ost = opt.update(g, ost, z)
            return (optax.apply_updates(z, up), ost), None

        (z, _), _ = jax.lax.scan(step, (z0, opt.init(z0)),
                                 length=args.fit_steps)
        return z

    print(f"[3/3] oracle fits ... ({time.time()-t0:.0f}s)")
    tr_mu, tr_sd = latents_train.mean(), latents_train.std()
    rows = []
    for i in range(args.n_held):
        z = np.asarray(fit_oracle(jnp.asarray(held_flat[i])))
        dec = np.asarray(tr.infer(full_coords, jnp.asarray(z)))
        rmae = float(np.mean(per_channel_rmae(dec, held_flat[i])))
        # where do the oracle latents sit vs the training distribution
        # and the persisted diffusion scale [mn, mx]?
        zstd_units = float(np.mean(np.abs(z - tr_mu)) / tr_sd)
        out_of_scale = float(np.mean((z < mn) | (z > mx)))
        rows.append({"traj": i, "oracle_field_rmae": rmae,
                     "latent_mean_abs_sigma": zstd_units,
                     "frac_outside_diffusion_scale": out_of_scale})
        print(f"      traj {i}: oracle rMAE {rmae:.4f}, |z| {zstd_units:.2f}"
              f" train-sigma, {out_of_scale:.3%} outside [{mn:.2f},{mx:.2f}]"
              f" ({time.time()-t0:.0f}s)")

    res = {"run_dir": args.out, "rows": rows,
           "oracle_field_rmae_mean": float(np.mean(
               [r["oracle_field_rmae"] for r in rows])),
           "train_latent_stats": {"mean": float(tr_mu), "std": float(tr_sd),
                                  "scale": [mn, mx]},
           "elapsed_s": time.time() - t0}
    path = os.path.join(REPO, "examples", "f2_oracle_probe.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
