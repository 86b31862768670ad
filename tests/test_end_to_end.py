"""Minimum end-to-end slice (SURVEY §7): CNF fit -> latents -> diffusion
train -> DDIM sample -> decode -> metrics.  Exercises every layer at toy
scale through the public CLIs/APIs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from confild_tpu import config as cfg
from confild_tpu.core.packing import (minmax_to_unit_interval,
                                      unit_interval_to_minmax)
from confild_tpu.diffusion import create_gaussian_diffusion
from confild_tpu.models import unet as junet
from confild_tpu.train.cnf_trainer import CNFTrainer
from confild_tpu.train.diffusion_trainer import TrainLoop
from confild_tpu.analysis.metrics import per_channel_rmae
from confild_tpu.utils import logger as tlog


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    rng = np.random.default_rng(0)

    # --- synthetic spatiotemporal dataset: traveling waves ---
    t_len, n_pts, c = 16, 100, 2
    coords = rng.uniform(size=(n_pts, 2)).astype(np.float32)
    phase = np.linspace(0, 2 * np.pi, t_len)[:, None, None]
    fois = np.concatenate([
        np.sin(2 * np.pi * coords[None, :, :1] + phase),
        np.cos(2 * np.pi * coords[None, :, 1:2] + phase),
    ], axis=-1).astype(np.float32)
    np.save(tmp_path / "fois.npy", fois)
    np.save(tmp_path / "coords.npy", coords)

    # --- stage 1: CNF auto-decoding fit ---
    recipe = {
        "data_path": str(tmp_path / "fois.npy"),
        "coor_path": str(tmp_path / "coords.npy"),
        "save_path": str(tmp_path / "cnf_run"),
        "lumped_latent": True,
        "normalizer": {"method": "-11", "dim": 0},
        "batch_size": 8, "test_batch_size": 8, "multiGPU": 1,
        "readin_data_shape": "t N c", "batch_shape": "t N c",
        "hidden_size": 16, "epochs": 60, "loss_fn": "MSELoss",
        "test_criteria": "rMAE", "save_every": 20, "dims": 2,
        "NF": {"name": "SIRENAutodecoder_film", "num_hidden_layers": 2,
               "out_features": 2, "hidden_features": 32},
        "lr": {"nf": 1e-3, "latents": 3e-2},
    }
    (tmp_path / "cnf.yml").write_text(yaml.safe_dump(recipe))
    hp = cfg.basic_input(str(tmp_path / "cnf.yml"))
    tr = CNFTrainer(hp)
    tr.train(log_formats=())

    # CNF must reconstruct the training set decently
    recon = np.asarray(tr.infer(tr.train_coord, tr.state.latents))
    rmae = per_channel_rmae(recon, fois)
    assert np.all(rmae < 0.5), rmae

    # --- latent packing: (T, L) table -> (B=1, 1, T, L) image dataset ---
    latents = np.asarray(tr.state.latents)           # (16, 16)
    mx, mn = float(latents.max()), float(latents.min())
    images = minmax_to_unit_interval(latents, mx, mn)[None, None]  # (1,1,16,16)
    train_data = np.repeat(images, 16, axis=0)        # replicate trajectories

    # --- stage 2: diffusion training on latent images ---
    model = junet.create_model(
        image_size=16, num_channels=32, num_res_blocks=1,
        channel_mult="1,2", attention_resolutions="8", num_heads=2)
    diffusion = create_gaussian_diffusion(steps=20, noise_schedule="cosine")

    def data_iter():
        while True:
            yield train_data[:8], {}

    tlog.configure(str(tmp_path / "logs"), [])
    loop = TrainLoop(model=model, diffusion=diffusion, data=data_iter(),
                     batch_size=8, lr=1e-3, lr_anneal_steps=20,
                     save_interval=10**9, save_dir=str(tmp_path / "dckpt"))
    loop.run_loop()

    # --- sampling: DDIM on the trained model ---
    ema = loop.state.ema_params[0]

    def model_fn(x, t, **kw):
        return model.apply(ema, x, t)

    sample = diffusion.ddim_sample_loop(model_fn, (2, 1, 16, 16),
                                        jax.random.key(0))
    assert jnp.all(jnp.isfinite(sample))

    # --- decode sampled latents back to fields ---
    gen_latents = unit_interval_to_minmax(np.asarray(sample[0, 0]), mx, mn)
    fields = np.asarray(tr.infer(tr.train_coord, gen_latents))
    assert fields.shape == (16, 100, 2)
    assert np.all(np.isfinite(fields))
    # generated fields live in the data's value range (loose physics gate)
    assert np.abs(fields).max() < 3 * np.abs(fois).max()

    # --- physics gate: temporal spectra of generated vs training fields ---
    # (loose bound at toy training scale; the metric itself is the
    # BASELINE.md <1% gate instrument)
    from confild_tpu.analysis.metrics import spectra_relative_error
    err = spectra_relative_error(fields[..., 0].T, fois[..., 0].T, axis=-1)
    assert np.isfinite(err) and err < 10.0, err
