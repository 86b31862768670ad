"""Prior acceptance probe: noise-and-denoise round trips of TRAINING windows.

F2_POSTMORTEM.md's sharpest diagnostic: a usable diffusion prior must at
least approximately preserve its OWN training data under a q_sample to
t* followed by unconditional reverse diffusion back to 0.  The f2 prior
destroyed even in-support held-out latents at t* = T/4 (latent rel-L2
0.84-1.2); running the same probe on *training* windows discriminates
"the prior can't hold its own training set" (modelling/optimization
problem) from "held-outs are farther off-manifold than they look".

Runs off any demo run dir mid-training (uses the newest EMA checkpoint),
so stage-2 quality is observable BEFORE burning the conditional-experiment
budget.  Reports per-window latent rel-L2 and decoded field rMAE vs truth,
plus an unconditional-ensemble latent-std dispersion check.

Usage: python tools/prior_roundtrip.py --out examples/demo_out_f3 \
           [--n-windows 3] [--t-fracs 0.25,0.5]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="demo run dir")
    ap.add_argument("--n-windows", type=int, default=3)
    ap.add_argument("--t-fracs", default="0.25,0.5")
    ap.add_argument("--n-uncond", type=int, default=8,
                    help="unconditional samples for the dispersion check")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    if os.environ.get("CONFILD_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from confild_tpu import config as cfg
    from confild_tpu.analysis.metrics import per_channel_rmae
    from confild_tpu.cli.sample import load_unet_params
    from confild_tpu.core.packing import (minmax_to_unit_interval,
                                          unit_interval_to_minmax)
    from confild_tpu.diffusion import create_gaussian_diffusion
    from confild_tpu.train.cnf_trainer import CNFTrainer
    from examples.demo_common import load_demo_unet, sliding_windows

    t0 = time.time()
    out_dir = args.out
    with open(os.path.join(out_dir, "sim_meta.json")) as f:
        meta = json.load(f)
    n_traj, n_snap, grid = meta["n_traj"], meta["n_snap"], meta["grid"]
    # window/stride from the run's metrics config when available (the probe
    # may run mid-pipeline, before demo_metrics.json exists)
    window, stride, latent = n_snap, 4, None
    mpath = os.path.join(out_dir, "demo_metrics.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            c = json.load(f)["config"]
        window = c.get("window") or n_snap
        stride = c.get("window_stride", 4)
        latent = c.get("latent")
    else:
        ujson = os.path.join(out_dir, "dckpt", "unet.json")
        if os.path.exists(ujson):
            with open(ujson) as f:
                uc = json.load(f)
            window, latent = uc["n_snap"], uc["latent"]

    hp = cfg.basic_input(os.path.join(out_dir, "cnf.yml"))
    tr = CNFTrainer(hp, infer_mode=True)
    tr.load(-1)
    latents_train = np.asarray(tr.state.latents)
    latent = latent or latents_train.shape[-1]
    mx = float(np.load(os.path.join(out_dir, "dckpt", "data_max.npy")))
    mn = float(np.load(os.path.join(out_dir, "dckpt", "data_min.npy")))

    emas = sorted(glob.glob(os.path.join(out_dir, "dckpt", "ema_*.ckpt")))
    if not emas:
        raise SystemExit(f"no EMA checkpoint under {out_dir}/dckpt yet")
    model = load_demo_unet(os.path.join(out_dir, "dckpt"), window, latent)
    ema = load_unet_params(emas[-1], model)
    ema_step = emas[-1]

    normed = minmax_to_unit_interval(
        latents_train.reshape(n_traj, n_snap, latent), mx, mn)
    wins = sliding_windows(normed, window, stride)       # (n_win, T, L)
    truth = np.load(os.path.join(out_dir, "fois.npy")).reshape(
        n_traj, n_snap, grid * grid, 2)
    twins = sliding_windows(truth, window, stride)       # (n_win, T, N, 2)

    full_coords = np.stack(np.meshgrid(np.linspace(0, 1, grid),
                                       np.linspace(0, 1, grid),
                                       indexing="ij"), -1
                           ).reshape(-1, 2).astype(np.float32)

    diff = create_gaussian_diffusion(steps=1000, noise_schedule="cosine")
    n_ts = diff.num_timesteps

    K_ENS = 4

    @jax.jit
    def roundtrip(params, x0, t_star, key):
        """K_ENS independent noise-and-denoise round trips (vmapped)."""
        def one(k):
            xt = diff.q_sample(
                x0, jnp.full((x0.shape[0],), t_star, jnp.int32),
                jax.random.normal(k, x0.shape, x0.dtype))

            def model_fn(x, t, **kw):
                return model.apply(params, x, t)

            def step(img, i):
                tt = jnp.full((img.shape[0],), i, jnp.int32)
                o = diff.p_sample(model_fn, img, tt, jax.random.fold_in(k, i))
                return jnp.where(i <= t_star, o["sample"], img), None

            img, _ = jax.lax.scan(step, xt, jnp.arange(n_ts - 1, -1, -1))
            return img

        return jax.vmap(one)(jax.random.split(key, K_ENS))

    @jax.jit
    def uncond(params, key):
        def model_fn(x, t, **kw):
            return model.apply(params, x, t)
        return diff.p_sample_loop(
            model_fn, (args.n_uncond, 1, window, latent), key)

    # calibration: the raw round-trip rel-L2 is NOT a pass/fail number.
    # For latent images with per-entry std sigma (~0.40 in unit-interval
    # units) under the cosine schedule, even an IDEAL structureless
    # Gaussian prior N(0, sigma^2 I) has posterior-sample rel-L2
    #   sqrt(2 v / sigma^2),  v = sigma^2 (1-ab) / (ab sigma^2 + 1 - ab)
    # at t* (ab = alpha_bar(t*)); at t* = T/4 and sigma = 0.4 that is
    # ~1.02 — the f2/f3 "failures" (0.84-1.2) sat essentially AT the
    # structureless bound, not below some achievable ideal.  What a
    # LEARNED prior can beat is this bound (temporal smoothness, PCA
    # energy decay), so the probe reports ratios vs it: sample_gain > 1
    # and mean_gain > 1 mean the prior holds real structure.
    sigma2 = float(np.var(wins))
    t_fracs = [float(s) for s in args.t_fracs.split(",")]
    rng = np.random.default_rng(5)
    pick = rng.choice(wins.shape[0], size=min(args.n_windows, wins.shape[0]),
                      replace=False)
    rows = []
    for wi in pick:
        x0 = jnp.asarray(wins[wi])[None, None]            # (1,1,T,L)
        for fr in t_fracs:
            t_star = int(fr * n_ts)
            ab = float(diff.s.alphas_cumprod[t_star])
            v = sigma2 * (1 - ab) / (ab * sigma2 + 1 - ab)
            ideal_sample = float(np.sqrt(2 * v / sigma2))
            ideal_mean = float(np.sqrt(v * (1 + 1 / K_ENS) / sigma2))
            img = roundtrip(ema, x0, t_star,
                            jax.random.key(1000 + int(wi)))
            rt = np.asarray(img)[:, 0, 0]                 # (K, T, L)
            rels = [float(np.linalg.norm(r - wins[wi])
                          / np.linalg.norm(wins[wi])) for r in rt]
            rel = float(np.mean(rels))
            rel_mean = float(np.linalg.norm(rt.mean(0) - wins[wi])
                             / np.linalg.norm(wins[wi]))
            dec = np.asarray(tr.infer(
                full_coords,
                jnp.asarray(unit_interval_to_minmax(rt.mean(0), mx, mn))))
            frmae = float(np.mean(per_channel_rmae(
                dec.reshape(window, grid * grid, 2), twins[wi])))
            rows.append({"window": int(wi), "t_frac": fr,
                         "latent_rel_l2": rel,
                         "latent_rel_l2_ens_mean": rel_mean,
                         "ideal_gaussian_rel_l2": ideal_sample,
                         "ideal_gaussian_rel_l2_ens_mean": ideal_mean,
                         "sample_gain": ideal_sample / max(rel, 1e-9),
                         "mean_gain": ideal_mean / max(rel_mean, 1e-9),
                         "field_rmae": frmae})
            print(f"  win {wi} t*={fr:.2f}: latent relL2 {rel:.3f} "
                  f"(ideal {ideal_sample:.3f}, gain "
                  f"{ideal_sample / max(rel, 1e-9):.2f}), ens-mean relL2 "
                  f"{rel_mean:.3f} (ideal {ideal_mean:.3f}, gain "
                  f"{ideal_mean / max(rel_mean, 1e-9):.2f}), field rMAE "
                  f"{frmae:.3f} ({time.time()-t0:.0f}s)",
                  flush=True)

    g = np.asarray(uncond(ema, jax.random.key(7)))[:, 0]
    disp = float(g.std() / wins.std())
    print(f"  uncond dispersion (gen std / train std): {disp:.3f}")

    res = {
        "run_dir": out_dir, "ema": os.path.basename(ema_step),
        "rows": rows,
        "train_roundtrip_latent_rel_l2_mean": float(np.mean(
            [r["latent_rel_l2"] for r in rows])),
        "train_roundtrip_field_rmae_mean": float(np.mean(
            [r["field_rmae"] for r in rows])),
        # >1: the prior beats the structureless-Gaussian posterior bound
        # (i.e. it has learned real latent structure); ~1: it holds only
        # the marginal; <1: it actively destroys in-support data
        "sample_gain_mean": float(np.mean([r["sample_gain"] for r in rows])),
        "mean_gain_mean": float(np.mean([r["mean_gain"] for r in rows])),
        "uncond_dispersion": disp,
        "elapsed_s": round(time.time() - t0, 1),
    }
    out = args.json_out or os.path.join(out_dir, "prior_roundtrip.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
