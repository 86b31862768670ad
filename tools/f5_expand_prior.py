#!/usr/bin/env python
"""f5: expand the diffusion prior's data coverage 4x without retraining
the decoder.

Measured diagnosis chain (r5): at 16 sensors DPS already extracts all the
sensor information (sensor-only latent fit rMAE 0.92 ~= DPS in-dist 0.89,
examples/decoder_reg_probe.json / demo_conditional.json), the f3 sensor
sweep saturates at 0.614 even at 1000 sensors (24% coverage), and the
latent-space oracle sits at 0.42 — the field BETWEEN sensors must come
from the prior, and a prior trained on 16 trajectories cannot interpolate
the forced-turbulence attractor.  This tool quadruples the prior's
trajectory coverage at fixed decoder:

  1. [cpu] simulate 48 extra forced_soft trajectories (seed 20000 —
     disjoint from training seed 0 and held-out seed 777);
  2. [tpu] fit latent rows for the new snapshots against the FROZEN f4
     decoder (the auto-decoding contract: a latent per snapshot,
     reference scripts/train.py fix_nf semantics).  Stochastic
     1024-point minibatches per step, bf16 decoder matmuls with f32
     latents/Adam, chunked 1152 rows x 500-step segments (the axon
     worker dies on multi-minute single programs) with per-segment
     resume files;
  3. [tpu] retrain the stage-2 prior on the combined 64-trajectory
     window set (16 original + 48 new, same (mx, mn) latent-image scale
     as f4 so every dckpt consumer is unchanged) into
     examples/demo_out_f5/dckpt;
  4. stage examples/demo_out_f5 as a full run dir (decoder, data and
     demo_metrics.json staged from f4) so demo_conditional.py /
     demo_report.py run against it unchanged.

Every step is idempotent/resumable; run under the r4 supervisor wedge
machinery.  Usage:
  python tools/f5_expand_prior.py simulate          # cpu, safe anytime
  python tools/f5_expand_prior.py fit               # tpu
  python tools/f5_expand_prior.py train [--diff-steps N]
  python tools/f5_expand_prior.py stage
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

F4 = os.path.join(REPO, "examples", "demo_out_f4")
F5 = os.path.join(REPO, "examples", "demo_out_f5")

N_EXTRA = 48
EXTRA_SEED = 20000          # training seed 0, held-out seed 777 (+1..+3)
N_SNAP = 384
GRID = 64
LATENT = 256
ROW_CHUNK = 1152            # 3 trajectories per fit chunk
SEG_STEPS = 500             # one XLA program ~30 s; worker-crash safe
N_SEGS = 5                  # 2500 latent-Adam steps per chunk
POINTS_PER_STEP = 1024


def step_simulate():
    out = os.path.join(F5, "extra_fois.npy")
    if os.path.exists(out):
        print(f"simulate: {out} exists, skipping")
        return
    from examples.demo_turbulence import FLOW_PRESETS, simulate_turbulence
    os.makedirs(F5, exist_ok=True)
    t0 = time.time()
    data = simulate_turbulence(GRID, N_SNAP, N_EXTRA, seed=EXTRA_SEED,
                               **FLOW_PRESETS["forced_soft"])
    np.save(out, data.astype(np.float32))
    print(f"simulate: {data.shape} -> {out} ({time.time() - t0:.0f}s)")


def step_fit():
    """Latent rows for the extra snapshots against the frozen f4 decoder."""
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from confild_tpu import config as cfg
    from confild_tpu.train.cnf_trainer import CNFTrainer

    fit_dir = os.path.join(F5, "extra_latents")
    os.makedirs(fit_dir, exist_ok=True)
    final = os.path.join(F5, "extra_latents.npy")
    if os.path.exists(final):
        print(f"fit: {final} exists, skipping")
        return

    data = np.load(os.path.join(F5, "extra_fois.npy"))     # (48,T,g,g,2)
    flat = data.reshape(N_EXTRA * N_SNAP, GRID * GRID, 2)

    hp = cfg.basic_input(os.path.join(F4, "cnf.yml"))
    tr = CNFTrainer(hp, infer_mode=True, infer_dps=True)
    tr.load(-1)
    nf_params = tr.state.nf_params
    coords = np.stack(np.meshgrid(np.linspace(0, 1, GRID),
                                  np.linspace(0, 1, GRID),
                                  indexing="ij"), -1).reshape(-1, 2)
    xn_full = np.asarray(tr.in_normalizer.as_jax().normalize(
        jnp.asarray(coords, jnp.float32)))
    ynorm = tr.out_normalizer.as_jax()

    n_rows = flat.shape[0]
    n_chunks = (n_rows + ROW_CHUNK - 1) // ROW_CHUNK
    sched = optax.cosine_decay_schedule(1e-2, N_SEGS * SEG_STEPS, alpha=1e-2)
    opt = optax.adam(sched)

    # bf16 decoder torso: the committed Pallas decode path runs bf16 at the
    # same quality bar (rMAE 0.077); latents/Adam state stay f32
    nf_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if (hasattr(a, "dtype") and a.dtype == jnp.float32
            and a.ndim >= 2) else a, nf_params)

    @jax.jit
    def fit_segment(z, ost, step0, yn_rows, key):
        """SEG_STEPS Adam steps on latent rows, 1024 fresh mesh points
        per step (stochastic over the 4096-point grid)."""
        xn = jnp.asarray(xn_full)

        def loss_fn(z, idx):
            pred = tr.model(nf_bf16, xn[idx].astype(jnp.bfloat16),
                            z[:, None, :].astype(jnp.bfloat16))
            return jnp.mean(
                (pred.astype(jnp.float32) - yn_rows[:, idx]) ** 2)

        def body(carry, i):
            z, ost = carry
            idx = jax.random.choice(jax.random.fold_in(key, i),
                                    GRID * GRID, (POINTS_PER_STEP,),
                                    replace=False)
            loss, g = jax.value_and_grad(loss_fn)(z, idx)
            up, ost = opt.update(g, ost, z)
            return (optax.apply_updates(z, up), ost), loss

        (z, ost), losses = jax.lax.scan(body, (z, ost),
                                        step0 + jnp.arange(SEG_STEPS))
        return z, ost, losses[-1]

    t0 = time.time()
    for c in range(n_chunks):
        cpath = os.path.join(fit_dir, f"chunk_{c:03d}.npy")
        if os.path.exists(cpath):
            continue
        lo, hi = c * ROW_CHUNK, min((c + 1) * ROW_CHUNK, n_rows)
        yn_rows = jnp.asarray(np.asarray(
            ynorm.normalize(jnp.asarray(flat[lo:hi], jnp.float32))))
        z = jnp.zeros((hi - lo, LATENT), jnp.float32)
        ost = opt.init(z)
        loss = float("nan")
        for s in range(N_SEGS):
            z, ost, loss = fit_segment(z, ost, jnp.int32(s * SEG_STEPS),
                                       yn_rows, jax.random.key(1000 + c))
            loss = float(loss)       # host sync per ~30 s segment
        np.save(cpath, np.asarray(z))
        print(f"fit: chunk {c + 1}/{n_chunks} rows [{lo}:{hi}] "
              f"final loss {loss:.5f} ({time.time() - t0:.0f}s)", flush=True)

    chunks = [np.load(os.path.join(fit_dir, f"chunk_{c:03d}.npy"))
              for c in range(n_chunks)]
    lat = np.concatenate(chunks)
    np.save(final, lat)
    # quick fidelity spot check on the first trajectory's first 8 rows
    dec = np.asarray(tr.infer(coords.astype(np.float32),
                              jnp.asarray(lat[:8])))
    rmae = float(np.mean(np.abs(dec - flat[:8]))
                 / np.mean(np.abs(flat[:8])))
    print(f"fit: {lat.shape} -> {final}; spot-check decode rMAE "
          f"{rmae:.4f} ({time.time() - t0:.0f}s)")


def step_train(diff_steps: int, diff_batch: int):
    """Stage-2 prior on the combined 64-trajectory window set."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from confild_tpu import config as cfg
    from confild_tpu.core.packing import minmax_to_unit_interval
    from confild_tpu.diffusion import create_gaussian_diffusion
    from confild_tpu.train.cnf_trainer import CNFTrainer
    from confild_tpu.train.diffusion_trainer import TrainLoop
    from confild_tpu.utils import logger as tlog
    from examples.demo_common import (build_demo_unet, save_demo_unet_config,
                                      sliding_windows)

    window, stride = 64, 4
    hp = cfg.basic_input(os.path.join(F4, "cnf.yml"))
    tr = CNFTrainer(hp, infer_mode=True)
    tr.load(-1)
    lat16 = np.asarray(tr.state.latents).reshape(16, N_SNAP, LATENT)
    lat48 = np.load(os.path.join(F5, "extra_latents.npy")).reshape(
        N_EXTRA, N_SNAP, LATENT)
    imgs = np.concatenate([lat16, lat48])                  # (64,T,L)

    # SAME latent-image scale as f4: every consumer (conditional, report,
    # round-trip) unnormalizes with the run dir's data_max/min
    mx = float(np.load(os.path.join(F4, "dckpt", "data_max.npy")))
    mn = float(np.load(os.path.join(F4, "dckpt", "data_min.npy")))
    clipped = np.mean((imgs < mn) | (imgs > mx))
    normed = minmax_to_unit_interval(np.clip(imgs, mn, mx), mx, mn)
    print(f"train: latent images {imgs.shape}, f4 scale [{mn:.3f},{mx:.3f}]"
          f" (clipped {clipped:.2%}), unit std {normed.std():.3f}")

    dckpt = os.path.join(F5, "dckpt")
    os.makedirs(dckpt, exist_ok=True)
    np.save(os.path.join(dckpt, "data_max.npy"), np.float32(mx))
    np.save(os.path.join(dckpt, "data_min.npy"), np.float32(mn))

    train = sliding_windows(normed, window, stride)[:, None]
    print(f"train: {train.shape[0]} window images ({window}x{LATENT}) "
          f"from {imgs.shape[0]} trajectories")

    unet_kw = {"num_channels": 96, "channel_mult": "1,1,2,2,4"}
    save_demo_unet_config(dckpt, window, LATENT, **unet_kw)
    model = build_demo_unet(window, LATENT, **unet_kw)
    diffusion = create_gaussian_diffusion(steps=1000, noise_schedule="cosine")

    tlog.configure(os.path.join(F5, "dlogs"), ["csv"])
    import glob
    from confild_tpu.io import checkpoint as ckpt_io
    saved = sorted(glob.glob(os.path.join(dckpt, "model*.ckpt")),
                   key=ckpt_io.parse_resume_step)
    resume = saved[-1] if saved else ""
    if resume:
        print(f"train: resuming from {resume}")
    loop = TrainLoop(model=model, diffusion=diffusion, data=None,
                     device_data=train.astype(np.float32),
                     batch_size=diff_batch, lr=1e-4, ema_rate="0.999",
                     log_interval=200, save_interval=2500,
                     lr_anneal_steps=diff_steps,
                     resume_checkpoint=resume,
                     steps_per_call=25, save_dir=dckpt)
    t0 = time.time()
    loop.run_loop()
    print(f"train: {diff_steps} steps done ({time.time() - t0:.0f}s)")


def step_stage():
    """Make demo_out_f5 a complete run dir for the evidence consumers."""
    os.makedirs(os.path.join(F5, "cnf_run"), exist_ok=True)
    for name in ("fois.npy", "coords.npy", "sim_meta.json", "cnf.yml"):
        s, d = os.path.join(F4, name), os.path.join(F5, name)
        if os.path.exists(s) and not os.path.exists(d):
            shutil.copy(s, d)
            print(f"staged {name}")
    src_run = os.path.join(F4, "cnf_run")
    for name in os.listdir(src_run):
        if name.startswith("checkpoint_") or name == "normalizer_params.ckpt":
            d = os.path.join(F5, "cnf_run", name)
            if not os.path.exists(d):
                shutil.copy(os.path.join(src_run, name), d)
                print(f"staged cnf_run/{name}")
    # cnf.yml paths point at the f4 run dir — rewrite them for f5
    yml = os.path.join(F5, "cnf.yml")
    with open(yml) as f:
        text = f.read()
    text = text.replace("demo_out_f4", "demo_out_f5")
    with open(yml, "w") as f:
        f.write(text)
    # the conditional/report consumers read the pipeline config from the
    # run dir's demo_metrics.json; the f4 config applies verbatim (same
    # decoder, same window/grid/latent) — only the prior differs
    s = os.path.join(F4, "demo_metrics.json")
    d = os.path.join(F5, "demo_metrics.json")
    if os.path.exists(s) and not os.path.exists(d):
        with open(s) as f:
            rep = json.load(f)
        rep["staged_from"] = "demo_out_f4 (f5 retrains only the prior)"
        with open(d, "w") as f:
            json.dump(rep, f, indent=2)
        print("staged demo_metrics.json")
    print("f5 staged")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="+",
                    choices=["simulate", "fit", "train", "stage"])
    ap.add_argument("--diff-steps", type=int, default=30000)
    ap.add_argument("--diff-batch", type=int, default=64)
    args = ap.parse_args()
    if os.environ.get("CONFILD_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS alone; must be set before
        # backend init (simulate is numpy-only but shares this entry point)
        import jax
        jax.config.update("jax_platforms", "cpu")
    for s in args.steps:
        if s == "simulate":
            step_simulate()
        elif s == "fit":
            step_fit()
        elif s == "train":
            step_train(args.diff_steps, args.diff_batch)
        elif s == "stage":
            step_stage()


if __name__ == "__main__":
    main()
