"""Is the held-out oracle rMAE a REAL decoder-generalization ceiling or an
underconverged latent fit?

The f3 conditional diagnostic reported held-out oracle rMAE 0.43 from a
600-step fixed-lr latent fit — nearly f2's 0.45 — despite the f3 decoder's
train rMAE dropping 0.30 -> 0.071.  Two readings: (a) the decoder memorizes
(true ceiling ~0.43: conditional DPS can never beat it), or (b) the sharper
decoder needs a longer/decayed fit and the probe understates it.  This
script fits ONE held-out trajectory's latents at several budgets with
cosine lr decay and prints the rMAE trajectory — monotone large drops
past 600 steps mean (b).

Usage: python tools/oracle_convergence_probe.py --out examples/demo_out_f3
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--budgets", default="600,2000,6000,16000")
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from confild_tpu import config as cfg
    from confild_tpu.analysis.metrics import per_channel_rmae
    from confild_tpu.train.cnf_trainer import CNFTrainer
    from examples.demo_turbulence import FLOW_PRESETS, simulate_turbulence

    t0 = time.time()
    out_dir = args.out
    with open(os.path.join(out_dir, "demo_metrics.json")) as f:
        c = json.load(f)["config"]
    grid, latent = c["grid"], c["latent"]
    n_snap = c.get("window") or c["n_snap"]
    flow_kw = FLOW_PRESETS[c.get("flow", "decaying")]

    # same held-out protocol as demo_conditional (trajectory 0)
    held = simulate_turbulence(grid, n_snap, 1, seed=args.seed, **flow_kw)
    held_flat = held.reshape(n_snap, grid * grid, 2)

    hp = cfg.basic_input(os.path.join(out_dir, "cnf.yml"))
    tr = CNFTrainer(hp, infer_mode=True)
    tr.load(-1)
    nf_params = tr.state.nf_params

    full_coords = np.stack(np.meshgrid(np.linspace(0, 1, grid),
                                       np.linspace(0, 1, grid),
                                       indexing="ij"), -1
                           ).reshape(-1, 2).astype(np.float32)
    xn = tr.in_normalizer.as_jax().normalize(jnp.asarray(full_coords))
    ynorm = tr.out_normalizer.as_jax()
    y = jnp.asarray(held_flat)
    yn = ynorm.normalize(y)

    def make_fit(n_steps):
        sched = optax.cosine_decay_schedule(1e-2, n_steps, alpha=1e-2)
        opt = optax.adam(sched)

        @jax.jit
        def fit():
            z0 = jnp.zeros((n_snap, latent), jnp.float32)

            def loss_fn(z):
                pred = tr.model(nf_params, xn, z[:, None, :])
                return jnp.mean((pred - yn) ** 2)

            def step(carry, _):
                z, ost = carry
                loss, g = jax.value_and_grad(loss_fn)(z)
                up, ost = opt.update(g, ost, z)
                return (optax.apply_updates(z, up), ost), loss

            (z, _), losses = jax.lax.scan(step, (z0, opt.init(z0)),
                                          length=n_steps)
            return z, losses
        return fit

    rows = []
    for n_steps in [int(s) for s in args.budgets.split(",")]:
        z, losses = make_fit(n_steps)()
        dec = np.asarray(tr.infer(full_coords, z))
        rmae = float(np.mean(per_channel_rmae(dec, held_flat)))
        loss_tail = [float(x) for x in np.asarray(losses[-3:])]
        rows.append({"steps": n_steps, "oracle_rmae": rmae,
                     "final_losses": loss_tail,
                     "latent_norm": float(np.linalg.norm(np.asarray(z))
                                          / np.sqrt(z.size))})
        print(f"  {n_steps:6d} steps: oracle rMAE {rmae:.4f}  "
              f"(loss tail {loss_tail[-1]:.3e}, "
              f"{time.time()-t0:.0f}s)", flush=True)

    # train-latent reference: rms-norm of the table rows the prior trained on
    train_norm = float(np.linalg.norm(np.asarray(tr.state.latents))
                       / np.sqrt(tr.state.latents.size))
    res = {"run_dir": out_dir, "rows": rows,
           "train_latent_rms": train_norm,
           "elapsed_s": round(time.time() - t0, 1)}
    out = args.json_out or os.path.join("examples",
                                        "oracle_convergence_probe.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
