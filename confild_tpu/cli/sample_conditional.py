"""Conditional (DPS) generation CLI — the Case4 random-sensor workflow as a
script (reference ``ConditionalDiffusionGeneration/inference_scripts/Case4/
random_sensor/inference_phy_random_sensor.ipynb``).

Config keys follow the notebook's input-directory contract (reference
``README.md:100-131``):

  cnf_checkpoint, cnf_normalizer, cnf_coords   — full-mesh decode assets
  sensor_coords, sensor_measures               — sparse sensor data
  data_max, data_min                           — latent scale files
  ema_path + UNet keys                         — diffusion model
  operator (case2|case3|case4|inpainting), conditioning (ps|...), scale
  no_of_samples, time_length, latent_size, steps, noise_schedule
  infos (optional .npz with Mask + reduced_shape for grid reconstruction)

Samples are vmapped over the ensemble axis (the notebook loops in Python);
with more than one device the ensemble shards over the data mesh.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from confild_tpu import config as cfgmod
from confild_tpu.cli.sample import load_unet_params
from confild_tpu.cli.train_diffusion import build_model_and_diffusion
from confild_tpu.core.packing import reconstruct_frame
from confild_tpu.guidance import (create_sampler, get_conditioning_method,
                                  get_noise, get_operator)
from confild_tpu.inference import decoder
from confild_tpu.parallel import mesh as pmesh


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    hp = cfgmod.basic_input(argv[0])

    model, _ = build_model_and_diffusion(hp)
    # inference-only: pre-cast torso kernels so the guided scan body does
    # not re-convert every weight f32->bf16 per denoise step (bit-identical)
    params = model.cast_torso_params(load_unet_params(hp.ema_path, model))

    measurement = jnp.asarray(np.load(hp.sensor_measures), jnp.float32)
    mask = jnp.ones_like(measurement)

    op_kwargs = dict(
        coords_path=hp.sensor_coords,
        max_val_path=hp.data_max,
        min_val_path=hp.data_min,
        normalizer_params_path=hp.cnf_normalizer,
        ckpt_path=hp.cnf_checkpoint,
        batch_size=hp.get("operator_batch_size", 384),
    )
    operator = get_operator(hp.get("operator", "case4"), **op_kwargs)
    noiser = get_noise(hp.get("noise", "gaussian"),
                       sigma=hp.get("noise_sigma", 0.0))
    cond_method = get_conditioning_method(
        hp.get("conditioning", "ps"), operator, noiser,
        scale=hp.get("scale", 1.0))

    sampler = create_sampler(
        sampler=hp.get("sampler", "ddpm"),
        steps=hp.get("steps", 1000),
        noise_schedule=hp.get("noise_schedule", "cosine"),
        model_mean_type=hp.get("model_mean_type", "epsilon"),
        model_var_type=hp.get("model_var_type", "fixed_large"),
        dynamic_threshold=hp.get("dynamic_threshold", False),
        clip_denoised=hp.get("clip_denoised", True),
        timestep_respacing=hp.get("timestep_respacing") or None,
    )

    n = hp.get("no_of_samples", 10)
    shape = (1, 1, hp.time_length, hp.latent_size)
    key = jax.random.key(hp.get("seed", 0))
    x_starts = jax.random.normal(key, (n, *shape), jnp.float32)

    # apply the noise model to the measurements (notebook cell 14:
    # y_n = noiser(y)); 'clean' / sigma=0 is the identity
    noise_key = jax.random.key(hp.get("seed", 0) + 2)
    measurement = noiser(measurement, key=noise_key)

    def run_one(params, x_start, k):
        def model_fn(x, t, **kw):
            return model.apply(params, x, t)
        return sampler.p_sample_loop(model_fn, x_start, mask * measurement,
                                     cond_method, k)

    keys = jax.random.split(jax.random.key(hp.get("seed", 0) + 1), n)
    n_dev = len(jax.devices())
    if n_dev > 1 and n % n_dev == 0:
        mesh = pmesh.get_mesh(n_dev)
        x_starts = pmesh.shard_batch(x_starts, mesh)
        keys = pmesh.shard_batch(keys, mesh)
    # params as jit args (no constant-inlined weights), ensemble vmapped
    samples = jax.jit(jax.vmap(run_one, in_axes=(None, 0, 0)))(
        params, x_starts, keys)  # (n, 1, 1, T, L)
    samples = samples.reshape(n, hp.time_length, hp.latent_size)

    # decode full-resolution fields at the full mesh coords
    gen_latents = operator._unnorm(samples[:, None, :, :])[:, 0]
    full_coords = np.load(hp.cnf_coords)
    rows = gen_latents.reshape(-1, hp.latent_size)
    fields = decoder(full_coords, rows, operator.params,
                     operator.x_normalizer, operator.y_normalizer,
                     batch_size=hp.get("decode_batch_size", 16))
    fields = fields.reshape(n, hp.time_length, *fields.shape[1:])

    os.makedirs(os.path.dirname(os.path.abspath(hp.save_path)), exist_ok=True)
    np.save(hp.save_path, fields)
    print(f"saved conditional samples {fields.shape} -> {hp.save_path}")

    if hp.get("infos"):
        info = np.load(hp.infos)
        grid = reconstruct_frame(fields[0, 0], info["Mask"],
                                 info["reduced_shape"], 0.0)
        print(f"grid reconstruction: {np.asarray(grid).shape}")


if __name__ == "__main__":
    main()
