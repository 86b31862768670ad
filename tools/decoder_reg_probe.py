"""Which latent-space regularizer makes the f3 auto-decoder GENERALIZE?

The f3 conditional evidence localizes the failure to the decoder's latent
space, not the prior or the guidance: held-out oracle-fit rMAE 0.43 (vs
train rMAE 0.07), and the in-distribution control (sensors from a training
snapshot) still reconstructs at field rMAE 0.89 with sensors matched at
0.017 — DPS gradients through the SIREN find sensor-matching-but-wrong
latents because the space between training codes does not decode to
anything physical.

This probe trains SHORT (same data, fewer epochs) decoder variants under
the new opt-in regularizers (``latent_noise_std``, ``latent_l2``,
cnf_trainer.py) and measures, per arm:

  train_rmae        fit quality on training snapshots (the floor)
  oracle_rmae       4000-step cosine-decayed latent fit on a HELD-OUT
                    trajectory, full-field rMAE (decoder-generalization
                    ceiling — what DPS could at best reach)
  interp_rmae       decode the midpoint of temporally-adjacent training
                    codes vs the midpoint field (latent-space smoothness)
  sensor_fit_rmae   latent fit on 16 sensor points only (+ tiny ||z||^2),
                    full-field rMAE (sensor-information propagation — the
                    quantity DPS guidance actually exercises, minus the
                    prior)
  perturb_rmae      decode z + sigma*eps at training codes vs the clean
                    targets (neighborhood robustness)

Arms run strictly sequentially (single TPU; concurrent clients crash the
axon worker).  Usage:
  python tools/decoder_reg_probe.py --out examples/demo_out_f3 \
      --epochs 1250 --json-out examples/decoder_reg_probe.json
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = [
    ("base", {}),
    ("n05", {"latent_noise_std": 0.05}),
    ("n15", {"latent_noise_std": 0.15}),
    ("n05_l2", {"latent_noise_std": 0.05, "latent_l2": 3e-3}),
    ("l2", {"latent_l2": 3e-3}),
    # POD-initialized latent table (tools/pca_ceiling.py --dump-latents):
    # the linear ceiling probe showed a 256-dim LINEAR code generalizing 2x
    # better held-out than the zero-init auto-decoded space, so organize
    # the space globally from step 0 and let the SIREN refine it
    ("pca", {"latent_init": "/tmp/regprobe/pca_latents.npy"}),
    ("pca_n05", {"latent_init": "/tmp/regprobe/pca_latents.npy",
                 "latent_noise_std": 0.05}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="f3 run dir (data source)")
    ap.add_argument("--epochs", type=int, default=1250)
    ap.add_argument("--arms", default=",".join(a for a, _ in ARMS))
    ap.add_argument("--n-sensors", type=int, default=16)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--work", default="/tmp/regprobe")
    ap.add_argument("--json-out", default="examples/decoder_reg_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from confild_tpu import config as cfg
    from confild_tpu.analysis.metrics import per_channel_rmae
    from confild_tpu.train.cnf_trainer import CNFTrainer
    from examples.demo_turbulence import FLOW_PRESETS, simulate_turbulence

    t0 = time.time()
    with open(os.path.join(args.out, "cnf.yml")) as f:
        base_cfg = yaml.safe_load(f)
    with open(os.path.join(args.out, "demo_metrics.json")) as f:
        c = json.load(f)["config"]
    grid, n_held = c["grid"], (c.get("window") or c["n_snap"])
    flow_kw = FLOW_PRESETS[c.get("flow", "decaying")]

    held = simulate_turbulence(grid, n_held, 1, seed=args.seed, **flow_kw)
    held_flat = np.asarray(held).reshape(n_held, grid * grid, 2)

    fois = np.load(base_cfg["data_path"], mmap_mode="r")
    n_total = fois.shape[0]
    n_snap_per_traj = c["n_snap"]
    rng = np.random.default_rng(args.seed)
    sensors = rng.choice(grid * grid, size=args.n_sensors, replace=False)
    full_coords = np.stack(np.meshgrid(np.linspace(0, 1, grid),
                                       np.linspace(0, 1, grid),
                                       indexing="ij"), -1
                           ).reshape(-1, 2).astype(np.float32)

    # temporally-adjacent training pairs (same trajectory) + probe rows
    pair_lo = rng.choice(n_total - 1, size=64, replace=False)
    pair_lo = pair_lo[(pair_lo % n_snap_per_traj) != n_snap_per_traj - 1]
    probe_rows = rng.choice(n_total, size=64, replace=False)

    results = {"protocol": {
        "epochs": args.epochs, "n_sensors": args.n_sensors,
        "seed": args.seed, "held_snaps": n_held,
        "train_cfg_source": os.path.join(args.out, "cnf.yml")}, "arms": {}}
    if os.path.exists(args.json_out):  # wedge-retry resume: keep done arms
        with open(args.json_out) as f:
            prev = json.load(f)
        if prev.get("protocol") == results["protocol"]:
            results["arms"] = prev.get("arms", {})
    want = args.arms.split(",")

    for name, knobs in ARMS:
        if name not in want:
            continue
        if name in results["arms"]:
            continue  # already measured (wedge-retry resume)
        ta = time.time()
        work = os.path.join(args.work, name)
        os.makedirs(work, exist_ok=True)
        cfg_d = copy.deepcopy(base_cfg)
        cfg_d.update(knobs)
        cfg_d["epochs"] = args.epochs
        # checkpoint often enough that a tunnel-wedge retry resumes cheaply
        cfg_d["save_every"] = min(args.epochs, 250)
        cfg_d["save_path"] = os.path.join(work, "run")
        lr = cfg_d.get("lr", {})
        if "decay_epochs" in lr:
            lr["decay_epochs"] = args.epochs
        cfg_path = os.path.join(work, "cnf.yml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg_d, f)

        hp = cfg.basic_input(cfg_path)
        tr = CNFTrainer(hp)
        tr.load(-1)
        if tr.state is not None and int(tr.state.epoch):
            # the trainer treats hp.epochs as ADDITIONAL on resume (the
            # reference contract); a wedge-retry should train the remainder
            hp.epochs = max(args.epochs - int(tr.state.epoch), 0)
        tr.train(log_formats=())

        _, eval_rmae, _ = tr._build_train_fns(False)
        train_rmae = float(np.mean(np.asarray(eval_rmae(tr.state))))

        nf_params = tr.state.nf_params
        xn = tr.in_normalizer.as_jax().normalize(jnp.asarray(full_coords))
        ynorm = tr.out_normalizer.as_jax()
        latents = np.asarray(tr.state.latents)
        lat_rms = float(np.linalg.norm(latents) / np.sqrt(latents.size))

        def make_fit(n_steps, sensor_only, z_l2, _nf=nf_params, _xn=xn,
                     _yn=ynorm, chunk=250):
            """Adam latent fit, CHUNKED into <=chunk-step programs.

            The axon worker dies on single multi-minute XLA programs (two
            probe generations crashed right after a 4000-step whole-fit
            scan); the cosine schedule rides the Adam count in the carried
            optimizer state, so chunking is bit-equivalent to one scan.
            The sensor-only fit also decodes ONLY the sensor coordinates
            (256x fewer points than the old full-grid decode + slice).
            """
            sched = optax.cosine_decay_schedule(1e-2, n_steps, alpha=1e-2)
            opt = optax.adam(sched)
            coords_fit = _xn[jnp.asarray(sensors)] if sensor_only else _xn

            @jax.jit
            def run_chunk(z, ost, yn_t):
                def loss_fn(z):
                    pred = tr.model(_nf, coords_fit, z[:, None, :])
                    mse = jnp.mean((pred - yn_t) ** 2)
                    return mse + z_l2 * jnp.mean(z ** 2)

                def step(carry, _):
                    z, ost = carry
                    loss, g = jax.value_and_grad(loss_fn)(z)
                    up, ost = opt.update(g, ost, z)
                    return (optax.apply_updates(z, up), ost), loss

                (z, ost), losses = jax.lax.scan(step, (z, ost), length=chunk)
                return z, ost, losses[-1]

            def fit(y_raw):
                yn_t = _yn.normalize(y_raw)
                if sensor_only:
                    yn_t = yn_t[:, jnp.asarray(sensors)]
                z = jnp.zeros((y_raw.shape[0], latents.shape[-1]),
                              jnp.float32)
                ost = opt.init(z)
                loss = None
                for _ in range(-(-n_steps // chunk)):
                    z, ost, loss = run_chunk(z, ost, yn_t)
                    jax.block_until_ready(z)
                return z, loss
            return fit

        # probes 1-2 fit a 16-row subsample of the held-out trajectory
        # (every 4th snapshot): 4x cheaper than all 64 rows, same signal
        sub = np.arange(0, n_held, max(n_held // 16, 1))[:16]
        held_sub = held_flat[sub]

        # 1) full-field oracle on held-out trajectory
        z, _ = make_fit(2000, False, 0.0)(jnp.asarray(held_sub))
        dec = np.asarray(tr.infer(full_coords, z))
        oracle = float(np.mean(per_channel_rmae(dec, held_sub)))

        # 2) sensor-only fit on held-out trajectory (what guidance sees)
        z_s, _ = make_fit(3000, True, 1e-3)(jnp.asarray(held_sub))
        dec_s = np.asarray(tr.infer(full_coords, z_s))
        sensor_fit = float(np.mean(per_channel_rmae(dec_s, held_sub)))

        # 3) midpoint interpolation of adjacent training codes
        z_mid = jnp.asarray((latents[pair_lo] + latents[pair_lo + 1]) / 2)
        dec_m = np.asarray(tr.infer(full_coords, z_mid))
        mid_f = (np.asarray(fois[pair_lo]) + np.asarray(fois[pair_lo + 1])) / 2
        interp = float(np.mean(per_channel_rmae(dec_m, mid_f)))

        # 4) neighborhood robustness at training codes
        eps = np.random.default_rng(1).normal(
            size=(len(probe_rows), latents.shape[-1])).astype(np.float32)
        z_p = jnp.asarray(latents[probe_rows] + 0.05 * eps)
        dec_p = np.asarray(tr.infer(full_coords, z_p))
        perturb = float(np.mean(per_channel_rmae(
            dec_p, np.asarray(fois[probe_rows]))))

        row = {"knobs": knobs, "epochs_trained": int(tr.state.epoch),
               "train_rmae": train_rmae,
               "oracle_rmae": oracle, "sensor_fit_rmae": sensor_fit,
               "interp_rmae": interp, "perturb_rmae": perturb,
               "latent_rms": lat_rms,
               "elapsed_s": round(time.time() - ta, 1)}
        results["arms"][name] = row
        print(f"[{name}] train {train_rmae:.3f} oracle {oracle:.3f} "
              f"sensor-fit {sensor_fit:.3f} interp {interp:.3f} "
              f"perturb {perturb:.3f} lat-rms {lat_rms:.3f} "
              f"({row['elapsed_s']:.0f}s)", flush=True)
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)

    results["elapsed_s"] = round(time.time() - t0, 1)
    with open(args.json_out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: {a: {m: round(v, 4) for m, v in r.items()
                              if isinstance(v, float)}
                          for a, r in results["arms"].items()}
                      if k == "arms" else results[k]
                      for k in results}))


if __name__ == "__main__":
    main()
