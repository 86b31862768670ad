"""Noised-classifier training CLI: ``python -m confild_tpu.cli.train_classifier
case.yml``.

The reference ships the classifier half of ADM (``EncoderUNetModel``,
``UnconditionalDiffusionTraining_and_Generation/src/unet.py:683-894``) and
the guidance hooks (``src/gaussian_diffusion.py:356-393``) but no trainer
CLI for it — upstream guided-diffusion's ``classifier_train.py`` is the
missing entry point this command supplies.

Recipe keys (same style as the diffusion recipes)::

    train_data_path: latents.npy      # (N, T, L) latent images
    label_path: labels.npy            # (N,) int class labels
    image_size: 64
    classifier_width: 128
    classifier_depth: 2
    classifier_attention_resolutions: "32,16,8"
    out_channels: 2                   # number of classes
    batch_size: 32
    lr: 3.e-4
    lr_anneal_steps: 10000
    noised: true                      # classify q_sample(x, t) at random t
    steps: 1000
    noise_schedule: cosine
    diffusion_log_path: ./diff_logs   # optional: reuse the diffusion run's
                                      # persisted data_max/min.npy scale
    data_max: 3.2                     # optional: explicit scale override
    data_min: -3.2
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from confild_tpu import config as cfgmod
from confild_tpu.diffusion import create_gaussian_diffusion
from confild_tpu.models.unet_extras import create_classifier
from confild_tpu.parallel import mesh as pmesh
from confild_tpu.train.classifier_trainer import ClassifierTrainLoop
from confild_tpu.utils import logger as tlog


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    np.random.seed(42)
    hp = cfgmod.basic_input(argv[0])

    log_dir = hp.get("log_path") or "./classifier_logs"
    tlog.configure(log_dir, ["stdout", "log", "csv"])

    # Same normalization contract as the diffusion stage: the classifier must
    # see exactly the latent-image space the sampler will ask it to grade, so
    # prefer the scale the diffusion run persisted (data_max/min.npy in its
    # log dir — sigma-based when the demo's --scale-sigmas was used) over a
    # recomputed min-max, which silently diverges and degrades cond_fn
    # gradients.  Recipe keys data_max/data_min or diffusion_log_path select
    # it; plain min-max of the training tensor is the fallback.
    raw = np.load(hp.train_data_path).astype(np.float32)
    if hp.get("data_max") is not None and hp.get("data_min") is not None:
        mx, mn = float(hp.data_max), float(hp.data_min)
    elif hp.get("diffusion_log_path"):
        mx = float(np.load(os.path.join(hp.diffusion_log_path, "data_max.npy")))
        mn = float(np.load(os.path.join(hp.diffusion_log_path, "data_min.npy")))
    else:
        mx, mn = float(raw.max()), float(raw.min())
    if mx <= mn:
        raise ValueError(
            f"degenerate latent scale: data_max={mx} <= data_min={mn}")
    normed = ((raw - mn) / (mx - mn) * 2 - 1)[:, None]
    labels = np.load(hp.label_path).astype(np.int32)
    assert len(labels) == len(normed), \
        f"{len(labels)} labels for {len(normed)} samples"

    def labeled_iter():
        rng = np.random.default_rng(42)
        while True:
            idx = rng.integers(0, len(normed), size=hp.batch_size)
            yield normed[idx], labels[idx]

    model = create_classifier(
        image_size=hp.image_size,
        classifier_width=hp.get("classifier_width", 128),
        classifier_depth=hp.get("classifier_depth", 2),
        classifier_attention_resolutions=hp.get(
            "classifier_attention_resolutions", "32,16,8"),
        out_channels=hp.get("out_channels", 2),
        dims=hp.get("dims", 2),
    )
    diffusion = create_gaussian_diffusion(
        steps=hp.get("steps", 1000),
        noise_schedule=hp.get("noise_schedule", "cosine"))

    n_dev = len(jax.devices())
    while n_dev > 1 and hp.batch_size % n_dev != 0:
        n_dev -= 1
    mesh = pmesh.get_mesh(n_dev) if n_dev > 1 else None

    ClassifierTrainLoop(
        model=model,
        diffusion=diffusion,
        data=labeled_iter(),
        batch_size=hp.batch_size,
        lr=float(hp.lr),
        weight_decay=hp.get("weight_decay", 0.05),
        lr_anneal_steps=hp.get("lr_anneal_steps", 0),
        noised=hp.get("noised", True),
        log_interval=hp.get("log_interval", 10),
        save_interval=hp.get("save_interval", 10000),
        save_dir=log_dir,
        mesh=mesh,
        keep_checkpoints=hp.get("keep_checkpoints", 0),
    ).run_loop()


if __name__ == "__main__":
    main()
