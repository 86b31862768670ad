"""Diffusion training CLI: ``python -m confild_tpu.cli.train_diffusion
case.yml`` (reference ``UnconditionalDiffusionTraining_and_Generation/
scripts/train.py``).

Data contract preserved: ``train_data_path``/``valid_data_path`` .npy latent
stacks, global min-max to [-1, 1], channel dim added; the (max, min) pair is
saved to the log dir as ``data_max.npy``/``data_min.npy`` for the inference
CLIs.
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from confild_tpu import config as cfgmod
from confild_tpu.diffusion import create_gaussian_diffusion
from confild_tpu.models import unet as junet
from confild_tpu.parallel import mesh as pmesh
from confild_tpu.train.diffusion_trainer import (TrainLoop,
                                                 load_latent_image_data)
from confild_tpu.utils import logger as tlog


def build_model_and_diffusion(hp):
    model = junet.create_model(
        image_size=hp.image_size,
        num_channels=hp.num_channels,
        num_res_blocks=hp.num_res_blocks,
        channel_mult=hp.get("channel_mult"),
        attention_resolutions=hp.attention_resolutions,
        num_heads=hp.get("num_heads", 4),
        num_head_channels=hp.get("num_head_channels", -1),
        out_channels=hp.get("out_channels", 1),
        dims=hp.get("dims", 2),
        use_scale_shift_norm=hp.get("use_scale_shift_norm", False),
        dropout=hp.get("dropout", 0.0),
        use_bf16=hp.get("use_bf16", hp.get("use_fp16", False)),
        use_checkpoint=hp.get("use_checkpoint", False),
        remat_policy=hp.get("remat_policy", "full"),
        use_flash_attention=hp.get("use_flash_attention"),
        use_f32_tail=hp.get("use_f32_tail", False),
    )
    diffusion = create_gaussian_diffusion(
        steps=hp.steps,
        noise_schedule=hp.noise_schedule,
        learn_sigma=hp.get("learn_sigma", False),
        timestep_respacing=hp.get("timestep_respacing") or None,
    )
    return model, diffusion


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    np.random.seed(42)
    hp = cfgmod.basic_input(argv[0])

    log_dir = hp.get("log_path") or "./diffusion_logs"
    tlog.configure(log_dir, ["stdout", "log", "csv", "tensorboard"])

    data, valid_data, (mx, mn) = load_latent_image_data(
        hp.train_data_path, hp.get("valid_data_path"), hp.batch_size)
    np.save(os.path.join(log_dir, "data_max.npy"), mx)
    np.save(os.path.join(log_dir, "data_min.npy"), mn)

    model, diffusion = build_model_and_diffusion(hp)
    # the data mesh must evenly divide the batch
    n_dev = len(jax.devices())
    while n_dev > 1 and hp.batch_size % n_dev != 0:
        n_dev -= 1
    mesh = pmesh.get_mesh(n_dev) if n_dev > 1 else None

    TrainLoop(
        model=model,
        diffusion=diffusion,
        data=data,
        valid_data=valid_data,
        batch_size=hp.batch_size,
        microbatch=hp.get("microbatch", -1),
        lr=float(hp.lr),
        ema_rate=hp.get("ema_rate", "0.9999"),
        log_interval=hp.get("log_interval", 10),
        save_interval=hp.get("save_interval", 10000),
        resume_checkpoint=hp.get("resume_checkpoint", ""),
        weight_decay=hp.get("weight_decay", 0.0),
        lr_anneal_steps=hp.get("lr_anneal_steps", 0),
        save_dir=log_dir,
        mesh=mesh,
    ).run_loop()


if __name__ == "__main__":
    main()
