"""Conditional-generation physics experiment: zero-shot sparse-sensor
reconstruction of HELD-OUT turbulence via DPS.

This is the flagship CoNFiLD deliverable (reference
``ConditionalDiffusionGeneration/inference_scripts/Case4/random_sensor/
inference_phy_random_sensor.ipynb`` cells 22-39, ``README.md:100-131,202``):
given only O(10) random sensor readings per frame, reconstruct the full
spatiotemporal field by steering the unconditional latent-diffusion prior
with the differentiable-CNF measurement misfit at every reverse step.

Protocol:
  1. Simulate ``--n-held`` NEW trajectories (seed disjoint from the
     training seed 0) — these were never seen by CNF or diffusion training.
  2. Place ``--n-sensors`` random mesh points per trajectory; the
     measurement is the (T, n_sensors, 2) velocity trace at those points.
  3. Tune the DPS guidance (method, scale) on trajectory 0 at the full
     step count (guidance strength compounds per step, so a scale tuned
     on a respaced sampler does not transfer); evaluate ALL trajectories
     at full 1000-step DDPM with the chosen scale (an ensemble of
     ``--n-ens`` samples per trajectory).
  4. Report, per trajectory and pooled: sensor-trace rMAE and +-3 sigma
     band coverage (the notebook's acceptance plot), held-out FULL-FIELD
     rMAE of the ensemble mean, energy-spectra error and integral-timescale
     ratio of the conditional ensemble vs the held-out ground truth; an
     unconditional-ensemble control shows how much the sensors buy.
     Trajectory 0's full-field truth was consumed by the tuning, so every
     pooled/ratio metric is computed over the REMAINING trajectories only.

Artifacts: ``examples/demo_conditional.json`` + ``demo_cond_sensors.png``
+ ``demo_cond_fields.png``.

Run after ``demo_turbulence.py``: ``python examples/demo_conditional.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.demo_turbulence import (FLOW_PRESETS,  # noqa: E402
                                      simulate_turbulence)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="demo output dir")
    ap.add_argument("--n-held", type=int, default=4,
                    help="held-out trajectories to reconstruct")
    ap.add_argument("--n-sensors", type=int, default=16,
                    help="random sensor points per trajectory")
    ap.add_argument("--n-ens", type=int, default=8,
                    help="DPS samples per trajectory")
    ap.add_argument("--steps", type=int, default=1000,
                    help="reverse steps for the final runs")
    ap.add_argument("--seed", type=int, default=777,
                    help="held-out simulation seed (training used 0)")
    ap.add_argument("--scales", default="0.1,0.3,1.0,3.0",
                    help="guidance scales swept on trajectory 0.  The f3 "
                         "optimum sat at the old 1.0 boundary (ps@1.0 "
                         "0.903 < ps@0.3 0.913) so the default sweep now "
                         "extends to 3.0 and drops 0.03 (worst f3 "
                         "candidate by 8 points)")
    ap.add_argument("--prior-check", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="prior-coverage diagnostic: oracle latent fit of "
                         "each held-out trajectory (frozen decoder) + "
                         "noise-and-denoise round trips of the oracle "
                         "latent image through the unconditional prior")
    ap.add_argument("--sensor-sweep", default="1,10,100,1000",
                    help="sensor counts swept on trajectory 0 with the "
                         "tuned guidance (mirrors the reference notebook's "
                         "`no_of_sensors = 10 #1,10,100,1000`); empty "
                         "string disables")
    args = ap.parse_args()

    import jax
    if os.environ.get("CONFILD_FORCE_CPU"):
        # some TPU platform plugins ignore JAX_PLATFORMS alone; the
        # config update below is required before first device use
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from confild_tpu import config as cfg
    from confild_tpu.analysis.metrics import (integral_timescale,
                                              per_channel_rmae,
                                              spectra_relative_error)
    from confild_tpu.cli.sample import load_unet_params
    from confild_tpu.guidance import (create_sampler, get_conditioning_method,
                                      get_noise)
    from confild_tpu.guidance.operators import CNFDecodeOperator
    from confild_tpu.train.cnf_trainer import CNFTrainer

    here = os.path.dirname(os.path.abspath(__file__))
    out_dir = args.out or os.path.join(here, "demo_out")
    # prefer the run dir's own metrics copy (several demo output dirs can
    # coexist; the global file describes only the most recent run)
    metrics_path = os.path.join(out_dir, "demo_metrics.json")
    if not os.path.exists(metrics_path):
        if os.path.normpath(out_dir) != os.path.join(here, "demo_out"):
            # the global fallback describes whatever run wrote it LAST —
            # for an explicit --out dir that silently mixes configs
            # (observed: a forced-flow run scored against decaying held-outs)
            raise SystemExit(
                f"{metrics_path} missing — this run dir's pipeline has not "
                "completed (rerun demo_turbulence.py for this out dir)")
        metrics_path = os.path.join(here, "demo_metrics.json")
    with open(metrics_path) as f:
        c = json.load(f)["config"]
    grid, latent = c["grid"], c["latent"]
    # the diffusion prior's image time-length: the sliding-window size when
    # the run trained on windows, else the whole trajectory; every held-out
    # trajectory below is reconstructed at this length
    n_snap = c.get("window") or c["n_snap"]
    # held-out data MUST come from the same flow as the training run: for
    # the 'forced' (stationary) flow a fresh-seed trajectory lives on the
    # training attractor, which is what makes this experiment well-posed
    flow = c.get("flow", "decaying")
    flow_kw = FLOW_PRESETS[flow]

    t0 = time.time()
    print(f"[1/5] simulating {args.n_held} held-out {flow} trajectories "
          f"({n_snap} snaps, seed {args.seed}) ...")
    held = simulate_turbulence(grid, n_snap, args.n_held, seed=args.seed,
                               **flow_kw)
    # (n_held, T, grid, grid, 2) -> flat mesh axis
    held_flat = held.reshape(args.n_held, n_snap, grid * grid, 2)

    print("[2/5] loading stage-1/2 assets ...")
    hp = cfg.basic_input(os.path.join(out_dir, "cnf.yml"))
    tr = CNFTrainer(hp, infer_mode=True, infer_dps=True)
    tr.load(-1)  # full load: the latent table supplies the (max, min) scale
    latents_train = np.asarray(tr.state.latents)
    # prefer the diffusion stage's persisted latent-image scale (sigma-based
    # when --scale-sigmas was used); fall back to table min-max for old runs
    try:
        mx = float(np.load(os.path.join(out_dir, "dckpt", "data_max.npy")))
        mn = float(np.load(os.path.join(out_dir, "dckpt", "data_min.npy")))
    except FileNotFoundError:
        mx, mn = float(latents_train.max()), float(latents_train.min())

    import glob
    emas = sorted(glob.glob(os.path.join(out_dir, "dckpt", "ema_*.ckpt")))
    if not emas:
        raise SystemExit(f"no EMA checkpoint under {out_dir}/dckpt — "
                         "stage 2 (diffusion training) has not completed")
    from examples.demo_common import load_demo_unet
    model = load_demo_unet(os.path.join(out_dir, "dckpt"), n_snap, latent)
    ema = load_unet_params(emas[-1], model)

    full_coords = np.stack(np.meshgrid(np.linspace(0, 1, grid),
                                       np.linspace(0, 1, grid),
                                       indexing="ij"), -1).reshape(-1, 2)
    full_coords = full_coords.astype(np.float32)

    # --- sensors: random mesh points, fixed over the trajectory ----------
    rng = np.random.default_rng(args.seed + 1)
    sensor_idx = np.stack([
        rng.choice(grid * grid, size=args.n_sensors, replace=False)
        for _ in range(args.n_held)])                     # (n_held, S)
    measures = np.stack([held_flat[i, :, sensor_idx[i], :].transpose(1, 0, 2)
                         for i in range(args.n_held)])    # (n_held, T, S, 2)

    from confild_tpu.core import normalize as cnorm
    from confild_tpu.core.packing import (minmax_to_unit_interval,
                                          unit_interval_to_minmax)

    y_norm_full = tr.out_normalizer

    def ynorm_sliced(point_idx):
        """The demo's '-11' normalizer is fit with dim=0 over (t, N, c) ->
        per-mesh-point params (1, N, c); when decoding at a point subset the
        y-params must be sliced to those points."""
        if point_idx is not None and np.asarray(
                y_norm_full.params[0]).ndim == 3:
            return tuple(np.asarray(p)[:, point_idx, :]
                         for p in y_norm_full.params)
        return tuple(np.asarray(p) for p in y_norm_full.params)

    noiser = get_noise("clean")
    nf_params = tr.state.nf_params
    _compiled = {}

    # --- [2b] prior-coverage diagnostic ---------------------------------
    # Separates the two failure modes of sparse-sensor DPS: (a) the decoder
    # cannot represent held-out physics (oracle latent fit = latent-only
    # Adam against the frozen decoder, the reference trainer's cadence with
    # fix_nf semantics), vs (b) the diffusion prior assigns the held-out
    # latent image no mass (noise-and-denoise round trip: q_sample the
    # oracle image to t*, reverse-diffuse back, measure field error).
    prior_coverage = None
    if args.prior_check:
        import optax
        from confild_tpu.diffusion import create_gaussian_diffusion as _cgd
        full_diff = _cgd(steps=1000, noise_schedule="cosine",
                         timestep_respacing=str(args.steps)
                         if args.steps != 1000 else "")
        xn_full = tr.in_normalizer.as_jax().normalize(
            jnp.asarray(full_coords))
        ynorm_jax = tr.out_normalizer.as_jax()
        opt = optax.adam(1e-2)

        # the oracle fit must CONVERGE or the diagnostic understates the
        # decoder: 600 fixed-lr steps matched the f2 decoder, but a sharper
        # decoder (f3: hidden 384x6, train rMAE 0.07) has a harder latent
        # landscape — match the trainer's own cadence (cosine-decayed
        # latent lr, scripts/train.py semantics) over 4000 steps.  The fit
        # runs as 500-step segments: the axon worker dies on multi-minute
        # SINGLE XLA programs (observed here 11:33 killing the whole
        # conditional step), and a segmented scan is wedge-survivable
        n_fit, seg = 4000, 500
        fit_sched = optax.cosine_decay_schedule(1e-2, n_fit, alpha=1e-2)
        opt = optax.adam(fit_sched)

        @jax.jit
        def fit_segment(z, ost, yn):
            def loss_fn(z):
                pred = tr.model(nf_params, xn_full, z[:, None, :])
                return jnp.mean((pred - yn) ** 2)

            def step(carry, _):
                z, ost = carry
                loss, g = jax.value_and_grad(loss_fn)(z)
                up, ost = opt.update(g, ost, z)
                return (optax.apply_updates(z, up), ost), loss

            (z, ost), losses = jax.lax.scan(step, (z, ost), length=seg)
            return z, ost, losses[-1]

        def fit_oracle(y_target):
            """Latent rows minimizing the frozen-decoder misfit (latent-only
            Adam with cosine lr decay; the CNF trainer's fix_nf cadence)."""
            yn = ynorm_jax.normalize(y_target)
            z = jnp.zeros((y_target.shape[0], latent), jnp.float32)
            ost = opt.init(z)
            loss_mid = loss_end = jnp.float32(0)
            for s in range(n_fit // seg):
                z, ost, loss_end = fit_segment(z, ost, yn)
                if s == (n_fit // seg) // 2 - 1:
                    loss_mid = loss_end
            # convergence evidence: late-fit loss plateau ratio
            return z, loss_end, loss_mid

        @jax.jit
        def roundtrip(params, x0, t_star, key):
            """q_sample to t_star, then reverse-diffuse back to 0 with the
            unconditional model (full 1000-step schedule, no guidance)."""
            xt = full_diff.q_sample(
                x0, jnp.full((x0.shape[0],), t_star, jnp.int32),
                jax.random.normal(key, x0.shape, x0.dtype))

            def model_fn(x, t, **kw):
                return model.apply(params, x, t)

            def step(img, i):
                tt = jnp.full((img.shape[0],), i, jnp.int32)
                out = full_diff.p_sample(model_fn, img, tt,
                                         jax.random.fold_in(key, i))
                # freeze steps above t_star so one scan serves any t_star
                return jnp.where(i < t_star, out["sample"], img), None

            img, _ = jax.lax.scan(step, xt,
                                  jnp.arange(full_diff.num_timesteps - 1,
                                             -1, -1))
            return img

        print("[2b/5] prior-coverage diagnostic ...")
        oracle_rmae, rt_rows, fit_conv = [], [], []
        for i in range(args.n_held):
            z, loss_end, loss_mid = fit_oracle(jnp.asarray(held_flat[i]))
            fit_conv.append({"loss_mid": float(loss_mid),
                             "loss_end": float(loss_end)})
            dec = np.asarray(tr.infer(full_coords, z))
            oracle_rmae.append(float(np.mean(per_channel_rmae(
                dec, held_flat[i]))))
            x0 = jnp.asarray(minmax_to_unit_interval(
                np.asarray(z), mx, mn))[None, None]      # (1,1,T,L)
            n_ts = full_diff.num_timesteps
            for t_star in (n_ts // 4, n_ts // 2, (3 * n_ts) // 4):
                img = roundtrip(ema, x0, t_star, jax.random.key(50 + i))
                rt_lat = unit_interval_to_minmax(
                    np.asarray(img)[0, 0], mx, mn)
                rt_dec = np.asarray(tr.infer(full_coords,
                                             jnp.asarray(rt_lat)))
                rt_rows.append({
                    "traj": i, "t_star": int(t_star),
                    "t_star_frac": float(t_star) / n_ts,
                    "field_rmae_vs_truth": float(np.mean(
                        per_channel_rmae(rt_dec, held_flat[i]))),
                    "latent_rel_l2": float(
                        np.linalg.norm(np.asarray(img)[0, 0]
                                       - np.asarray(x0)[0, 0])
                        / np.linalg.norm(np.asarray(x0)[0, 0])),
                })
            print(f"      traj {i}: oracle rMAE {oracle_rmae[-1]:.4f}, "
                  f"round-trip rMAE "
                  f"{[round(r['field_rmae_vs_truth'], 3) for r in rt_rows[-3:]]}"
                  f" @ t*/T=1/4,1/2,3/4 ({time.time()-t0:.0f}s)")
        prior_coverage = {
            "oracle_field_rmae": oracle_rmae,
            "oracle_field_rmae_mean": float(np.mean(oracle_rmae)),
            "oracle_fit_convergence": fit_conv,
            "roundtrip": rt_rows,
        }

    def run_ensemble(coords, yn_params, measurement, scale, steps, n_ens,
                     seed, method="ps"):
        """One compiled guided program per (method, steps, shapes).

        The trajectory-varying arrays (sensor coords, sliced y-normalizer
        params, measurement) and the guidance scale enter as traced jit
        arguments, so the tuning sweep's scale candidates and every
        same-shape trajectory run share a single compilation of the
        1000-step guided scan instead of recompiling per call."""
        coords = jnp.asarray(coords, jnp.float32)
        yn_params = tuple(jnp.asarray(p) for p in yn_params)
        y = jnp.asarray(measurement)
        sig = (method, steps, n_ens, coords.shape, y.shape,
               tuple(p.shape for p in yn_params))
        if sig not in _compiled:
            sampler = create_sampler(
                sampler="ddpm", steps=1000, noise_schedule="cosine",
                timestep_respacing=str(steps) if steps != 1000 else None)

            def run_all(params, coords, yn_params, y, scale, x_starts, keys):
                op = CNFDecodeOperator(
                    params=nf_params, coords=coords,
                    x_normalizer=tr.in_normalizer,
                    y_normalizer=cnorm.Normalizer(
                        yn_params, y_norm_full.method, y_norm_full.dim),
                    max_val=mx, min_val=mn)
                cond = get_conditioning_method(method, op, noiser,
                                               scale=scale)

                def run_one(x_start, k):
                    def model_fn(x, t, **kw):
                        return model.apply(params, x, t)
                    return sampler.p_sample_loop(model_fn, x_start, y, cond,
                                                 k, return_distances=True)

                return jax.vmap(run_one)(x_starts, keys)

            _compiled[sig] = jax.jit(run_all)

        keys = jax.random.split(jax.random.key(seed), n_ens)
        x_starts = jax.random.normal(jax.random.key(seed + 1),
                                     (n_ens, 1, 1, n_snap, latent))
        samples, dists = _compiled[sig](
            ema, coords, yn_params, y, jnp.asarray(scale, jnp.float32),
            x_starts, keys)
        return (np.asarray(samples).reshape(n_ens, n_snap, latent),
                np.asarray(dists)[:, -1])

    def decode_full(gen_lat_rows):
        """(T, L) latent rows (physical range) -> (T, grid*grid, 2)."""
        return np.asarray(tr.infer(full_coords, jnp.asarray(gen_lat_rows)))

    def unnorm(samples):
        return unit_interval_to_minmax(samples, mx, mn)

    # --- [3/5] guidance tuning on trajectory 0 (the declared VALIDATION
    # trajectory: full-field truth is used to pick (method, scale); held-out
    # metrics below are pooled over the REMAINING trajectories only).
    # Tuning runs at the full step count — DPS guidance strength compounds
    # per step, so a scale tuned on a respaced sampler does not transfer. ---
    scales = [float(s) for s in args.scales.split(",")]
    cands = [("ps", s) for s in scales] + [("ps_linear_decay", 1.0)]
    print(f"[3/5] tuning guidance on trajectory 0 ({args.steps} steps): "
          f"{cands} ...")
    coords0, yn0 = full_coords[sensor_idx[0]], ynorm_sliced(sensor_idx[0])
    # the acceptance gates score physics as well as pointwise error — a
    # candidate that wins field rMAE while collapsing the integral
    # timescale (f3 chose ps_linear_decay@1.0: rMAE 0.902 but timescale
    # ratio 0.23 vs the >=0.70 gate) ships auto-failing evidence, so the
    # tuner filters on traj-0 physics before ranking by rMAE
    true_grid0 = held.reshape(args.n_held, n_snap, grid, grid, 2)[0]
    tau_true0 = max(float(integral_timescale(true_grid0[..., 0], 1.0)), 1e-9)
    sweep = {}
    for method, s in cands:
        samples, final_dist = run_ensemble(coords0, yn0, measures[0], s,
                                           steps=args.steps, n_ens=4,
                                           seed=10, method=method)
        fields = np.stack([decode_full(unnorm(x)) for x in samples])
        frmae = float(np.mean(per_channel_rmae(fields.mean(0), held_flat[0])))
        tau = float(np.mean([integral_timescale(
            fields[e].reshape(n_snap, grid, grid, 2)[..., 0], 1.0)
            for e in range(fields.shape[0])]))
        cand_grid = fields.reshape(-1, n_snap, grid, grid, 2)
        cspec = float(spectra_relative_error(
            np.concatenate([cand_grid[..., 0],
                            cand_grid[..., 1]]).reshape(-1, grid),
            np.concatenate([true_grid0[..., 0],
                            true_grid0[..., 1]]).reshape(-1, grid), axis=-1))
        sweep[f"{method}@{s}"] = {
            "field_rmae": frmae,
            "sensor_misfit": float(np.mean(final_dist)),
            "timescale": tau,
            "timescale_ratio": tau / tau_true0,
            "spectra_error": cspec,
        }
        print(f"      {method}@{s}: field rMAE {frmae:.4f}, sensor misfit "
              f"{np.mean(final_dist):.3f}, timescale {tau:.2f} "
              f"(ratio {tau / tau_true0:.2f}), spectra {cspec:.3f} "
              f"({time.time()-t0:.0f}s)")
    # physics-qualified first (slightly loose vs the pooled gates: the
    # tuning estimate is a 4-member single-trajectory statistic), best
    # rMAE within; fall back to best rMAE overall if nothing qualifies
    qualified = [k for k, v in sweep.items()
                 if v["timescale_ratio"] >= 0.6 and v["spectra_error"] <= 0.10]
    pool = qualified or list(sweep)
    if not qualified:
        print("      WARNING: no candidate meets the traj-0 physics bars "
              "(timescale ratio >= 0.6, spectra <= 0.10) — falling back "
              "to best field rMAE")
    best_key = min(pool, key=lambda k: sweep[k]["field_rmae"])
    best_method, best_scale = best_key.split("@")
    best_scale = float(best_scale)
    print(f"      chosen: {best_method} scale {best_scale} "
          f"(physics-qualified: {len(qualified)}/{len(sweep)})")

    # --- [4/5] full-step DPS reconstruction of every held-out traj -------
    print(f"[4/5] DPS reconstruction: {args.n_held} trajectories x "
          f"{args.n_ens} samples x {args.steps} steps ...")
    per_traj = []
    ens_fields = []          # (n_held, n_ens, T, grid*grid, 2)
    for i in range(args.n_held):
        samples, _ = run_ensemble(full_coords[sensor_idx[i]],
                                  ynorm_sliced(sensor_idx[i]),
                                  measures[i], best_scale,
                                  steps=args.steps, n_ens=args.n_ens,
                                  seed=100 + i, method=best_method)
        fields = np.stack([decode_full(unnorm(s)) for s in samples])
        ens_fields.append(fields)
        mean_f = fields.mean(0)
        # sensor-trace metrics on the DECODED fields at the sensor points
        tr_pred = fields[:, :, sensor_idx[i], :]      # (E, T, S, 2)
        tr_true = measures[i]                         # (T, S, 2)
        m, sd = tr_pred.mean(0), tr_pred.std(0)
        cover = float(np.mean((tr_true >= m - 3 * sd)
                              & (tr_true <= m + 3 * sd)))
        sensor_rmae = float(np.mean(np.abs(m - tr_true))
                            / np.mean(np.abs(tr_true)))
        field_rmae = [float(x) for x in per_channel_rmae(
            mean_f, held_flat[i])]
        member_rmae = float(np.mean([np.mean(per_channel_rmae(
            fields[e], held_flat[i])) for e in range(fields.shape[0])]))
        rel_l2 = float(np.linalg.norm(mean_f - held_flat[i])
                       / np.linalg.norm(held_flat[i]))
        per_traj.append({"traj": i, "role": "validation" if i == 0
                         else "held_out",
                         "sensor_rmae": sensor_rmae,
                         "sigma3_coverage": cover,
                         "field_rmae_mean": field_rmae,
                         "field_rmae_per_member": member_rmae,
                         "field_rel_l2_mean": rel_l2})
        print(f"      traj {i}: sensor rMAE {sensor_rmae:.4f}, 3sigma "
              f"coverage {cover:.3f}, field rMAE {field_rmae}, "
              f"member rMAE {member_rmae:.4f} ({time.time()-t0:.0f}s)")
    ens_fields = np.stack(ens_fields)

    # --- sensor-count sweep on trajectory 0 (reference protocol: the Case4
    # notebook's `no_of_sensors = 10 #1,10,100,1000` cell — same flow,
    # same trained model, only the sensor budget varies) ----------------
    sensor_sweep = []
    sweep_counts = [int(s) for s in args.sensor_sweep.split(",") if s]
    if sweep_counts:
        print(f"[4b/5] sensor-count sweep on trajectory 0: {sweep_counts} "
              f"sensors x {args.steps} steps ...")
        srng = np.random.default_rng(args.seed + 2)
        for n_s in sweep_counts:
            idx = np.sort(srng.choice(grid * grid, size=n_s, replace=False))
            meas = held_flat[0][:, idx, :]                 # (T, S, 2)
            samples, final_dist = run_ensemble(full_coords[idx],
                                               ynorm_sliced(idx),
                                               meas, best_scale,
                                               steps=args.steps, n_ens=4,
                                               seed=300 + n_s,
                                               method=best_method)
            fields = np.stack([decode_full(unnorm(s)) for s in samples])
            mean_f = fields.mean(0)
            frmae = float(np.mean(per_channel_rmae(mean_f, held_flat[0])))
            rel_l2 = float(np.linalg.norm(mean_f - held_flat[0])
                           / np.linalg.norm(held_flat[0]))
            tr_pred = fields[:, :, idx, :]
            sensor_rmae = float(np.mean(np.abs(tr_pred.mean(0) - meas))
                                / np.mean(np.abs(meas)))
            sensor_sweep.append({
                "n_sensors": n_s,
                "sensor_fraction": n_s / (grid * grid),
                "field_rmae": frmae,
                "field_rel_l2": rel_l2,
                "sensor_rmae": sensor_rmae,
                "sensor_misfit": float(np.mean(final_dist)),
            })
            print(f"      {n_s:5d} sensors: field rMAE {frmae:.4f}, rel L2 "
                  f"{rel_l2:.4f}, sensor rMAE {sensor_rmae:.4f} "
                  f"({time.time()-t0:.0f}s)")

    # in-distribution control: DPS-reconstruct a TRAINING trajectory from
    # the same sensor budget.  Low field rMAE here with high held-out rMAE
    # localizes the failure to prior coverage; high rMAE here too would
    # indict the guidance itself.
    in_dist = None
    if args.prior_check:
        print("      in-distribution control: DPS on training traj 0 ...")
        n_train_snaps = latents_train.shape[0]
        train0 = np.asarray(tr.infer(
            full_coords, jnp.asarray(latents_train[:n_snap])))  # (T, N, 2)
        idx0 = np.sort(np.random.default_rng(args.seed + 3).choice(
            grid * grid, size=args.n_sensors, replace=False))
        meas0 = train0[:, idx0, :]
        samples, _ = run_ensemble(full_coords[idx0], ynorm_sliced(idx0),
                                  meas0, best_scale, steps=args.steps,
                                  n_ens=4, seed=400, method=best_method)
        fields_id = np.stack([decode_full(unnorm(s)) for s in samples])
        in_dist = {
            "n_train_snaps_total": int(n_train_snaps),
            "field_rmae": float(np.mean(per_channel_rmae(
                fields_id.mean(0), train0))),
            "sensor_rmae": float(
                np.mean(np.abs(fields_id[:, :, idx0, :].mean(0) - meas0))
                / np.mean(np.abs(meas0))),
        }
        print(f"      in-dist field rMAE {in_dist['field_rmae']:.4f}, "
              f"sensor rMAE {in_dist['sensor_rmae']:.4f} "
              f"({time.time()-t0:.0f}s)")

    # control: unconditional ensemble scored against the same truth
    print("      control: unconditional ensemble vs the same truth ...")
    from confild_tpu.diffusion import create_gaussian_diffusion
    respaced = create_gaussian_diffusion(steps=1000, noise_schedule="cosine",
                                         timestep_respacing=str(args.steps)
                                         if args.steps != 1000 else "")

    @jax.jit
    def sample_uncond(params, key):
        def model_fn(x, t, **kw):
            return model.apply(params, x, t)
        return respaced.p_sample_loop(
            model_fn, (args.n_ens, 1, n_snap, latent), key)

    uncond = np.asarray(sample_uncond(ema, jax.random.key(999)))[:, 0]
    uncond_fields = np.stack([decode_full(unnorm(s)) for s in uncond])

    # --- [5/5] pooled physics metrics + plots ----------------------------
    # trajectory 0's full-field truth picked (method, scale), so EVERY
    # pooled metric — including the unconditional control and the
    # physics ratios — is computed over the remaining trajectories only
    # (all trajectories if only the validation one was run)
    print("[5/5] physics metrics + plots ...")
    held_ids = (list(range(1, args.n_held)) if args.n_held > 1 else [0])
    uncond_rmae = float(np.mean([
        np.mean(per_channel_rmae(uncond_fields.mean(0), held_flat[i]))
        for i in held_ids]))
    true_grid = held.reshape(args.n_held, n_snap, grid, grid, 2)
    gen_grid = ens_fields[held_ids].reshape(-1, n_snap, grid, grid, 2)
    true_pool = true_grid[held_ids]
    spec_err = spectra_relative_error(
        np.concatenate([gen_grid[..., 0], gen_grid[..., 1]]).reshape(-1, grid),
        np.concatenate([true_pool[..., 0],
                        true_pool[..., 1]]).reshape(-1, grid), axis=-1)
    tau_true = float(np.mean([integral_timescale(true_grid[i, ..., 0], 1.0)
                              for i in held_ids]))
    tau_cond = float(np.mean([integral_timescale(gen_grid[i, ..., 0], 1.0)
                              for i in range(gen_grid.shape[0])]))

    # sensor-trace plot: first trajectory, 4 sensors, u channel (the
    # notebook's cells 33-39 acceptance plot, +-3 sigma bands)
    fields0 = ens_fields[0]
    tr_pred = fields0[:, :, sensor_idx[0], :]
    m, sd = tr_pred.mean(0), tr_pred.std(0)
    tt = np.arange(n_snap)
    fig, axes = plt.subplots(2, 2, figsize=(11, 6), sharex=True)
    for j, ax in enumerate(axes.flat):
        ax.fill_between(tt, m[:, j, 0] - 3 * sd[:, j, 0],
                        m[:, j, 0] + 3 * sd[:, j, 0], color="r", alpha=0.25,
                        label="DPS ensemble +-3 sigma")
        ax.plot(tt, m[:, j, 0], "r-", lw=1.2, label="DPS ensemble mean")
        ax.plot(tt, measures[0][:, j, 0], "k.", ms=3.5, label="sensor truth")
        ax.set_title(f"sensor {j} (u)")
        ax.grid(alpha=0.3)
        if j == 0:
            ax.legend(fontsize=8)
    for ax in axes[1]:
        ax.set_xlabel("snapshot")
    fig.suptitle("held-out trajectory 0: sensor traces, truth vs DPS "
                 "reconstruction")
    fig.tight_layout()
    fig.savefig(os.path.join(here, "demo_cond_sensors.png"), dpi=120)
    plt.close(fig)

    # field comparison: truth / DPS mean / abs error at mid-trajectory
    fig, axes = plt.subplots(args.n_held, 3,
                             figsize=(9, 2.6 * args.n_held), squeeze=False)
    vmax = np.abs(true_grid[..., 0]).max()
    for i in range(args.n_held):
        tru = true_grid[i, n_snap // 2, :, :, 0]
        rec = ens_fields[i].mean(0)[n_snap // 2].reshape(grid, grid, 2)[..., 0]
        axes[i, 0].imshow(tru, cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        axes[i, 1].imshow(rec, cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        im = axes[i, 2].imshow(np.abs(rec - tru), cmap="magma", vmin=0,
                               vmax=vmax / 2)
        ys, xs = np.unravel_index(sensor_idx[i], (grid, grid))
        axes[i, 0].scatter(xs, ys, s=8, c="lime", marker="o",
                           edgecolors="k", linewidths=0.4)
        axes[i, 0].set_ylabel(f"traj {i}")
        for ax, title in zip(axes[i], ("truth (+ sensors)", "DPS mean",
                                       "|error|")):
            if i == 0:
                ax.set_title(title)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.suptitle("held-out u-velocity, mid-trajectory snapshot")
    fig.tight_layout()
    fig.savefig(os.path.join(here, "demo_cond_fields.png"), dpi=120)
    plt.close(fig)

    if sensor_sweep:
        # sweep plot: reconstruction error vs sensor budget (log-x), with
        # the unconditional ensemble as the zero-information anchor
        fig, ax = plt.subplots(figsize=(5.5, 3.6))
        ns = [r["n_sensors"] for r in sensor_sweep]
        ax.semilogx(ns, [r["field_rmae"] for r in sensor_sweep], "o-",
                    label="DPS field rMAE (ens. mean)")
        ax.semilogx(ns, [r["sensor_rmae"] for r in sensor_sweep], "s--",
                    label="sensor-trace rMAE")
        uc = float(np.mean(per_channel_rmae(uncond_fields.mean(0),
                                            held_flat[0])))
        ax.axhline(uc, color="gray", ls=":",
                   label="unconditional control")
        ax.set_xlabel("number of sensors")
        ax.set_ylabel("rMAE")
        ax.grid(alpha=0.3, which="both")
        ax.legend(fontsize=8)
        fig.suptitle("trajectory 0: reconstruction vs sensor budget")
        fig.tight_layout()
        fig.savefig(os.path.join(here, "demo_cond_sweep.png"), dpi=120)
        plt.close(fig)

    pooled_field_rmae = float(np.mean([
        np.mean(t["field_rmae_mean"]) for t in per_traj]))
    # trajectory 0 tuned (method, scale) on its full-field truth -> exclude
    # it from the held-out pool (matches held_ids above)
    held_out = [t for t in per_traj if t["role"] == "held_out"] or per_traj
    field_rmae_held_out = float(np.mean([
        np.mean(t["field_rmae_mean"]) for t in held_out]))
    report = {
        # provenance: which demo run dir (prior + decoder) produced these
        # numbers (r03 judge finding: evidence files must name their run)
        "run_dir": os.path.relpath(out_dir, here),
        "protocol": {
            "n_held": args.n_held, "n_sensors": args.n_sensors,
            "n_ens": args.n_ens, "steps": args.steps,
            "held_seed": args.seed, "grid": grid, "n_snap": n_snap,
            "sensor_fraction": args.n_sensors / (grid * grid),
            "guidance_method": best_method,
            "guidance_scale": best_scale, "tuning_sweep": sweep,
            "tuning_trajectory": 0,
        },
        "per_trajectory": per_traj,
        "sensor_rmae_pooled": float(np.mean([t["sensor_rmae"]
                                             for t in held_out])),
        "sigma3_coverage_pooled": float(np.mean([t["sigma3_coverage"]
                                                 for t in held_out])),
        "field_rmae_held_out": field_rmae_held_out,
        "field_rmae_per_member_held_out": float(np.mean([
            t["field_rmae_per_member"] for t in held_out])),
        # includes the validation trajectory — diagnostic only; every
        # ratio below uses the held-out pool
        "field_rmae_pooled_incl_validation": pooled_field_rmae,
        "field_rmae_unconditional_control": uncond_rmae,
        "conditioning_gain": uncond_rmae / max(field_rmae_held_out, 1e-9),
        "sensor_sweep": sensor_sweep,
        "prior_coverage": prior_coverage,
        "in_distribution_control": in_dist,
        "spectra_relative_error": float(spec_err),
        "integral_timescale_truth": tau_true,
        "integral_timescale_conditional": tau_cond,
        "timescale_ratio": tau_cond / tau_true,
        "wall_clock_s": round(time.time() - t0, 1),
    }
    path = os.path.join(here, "demo_conditional.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"report -> {path}")
    print(f"plots  -> {here}/demo_cond_{{sensors,fields}}.png")


if __name__ == "__main__":
    main()
