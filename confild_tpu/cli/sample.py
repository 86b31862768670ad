"""Unconditional generation CLI: ``python -m confild_tpu.cli.sample case.yml``
(reference ``UnconditionalDiffusionTraining_and_Generation/scripts/
inference.py``): sample latent images with the EMA U-Net, denormalize from
the saved (max, min), decode each latent row to fields through the trained
CNF, save .npy.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from confild_tpu import config as cfgmod
from confild_tpu.cli.train_diffusion import build_model_and_diffusion
from confild_tpu.core.packing import unit_interval_to_minmax
from confild_tpu.train.cnf_trainer import CNFTrainer


def load_unet_params(path: str, model):
    if path.endswith(".pt"):
        from confild_tpu.io.torch_port import load_unet_checkpoint
        return jax.tree.map(jnp.asarray, load_unet_checkpoint(path, model))
    from confild_tpu.io.checkpoint import load_pytree
    return jax.tree.map(jnp.asarray, load_pytree(path))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    hp = cfgmod.basic_input(argv[0])

    model, diffusion = build_model_and_diffusion(hp)
    # inference-only: pre-cast torso kernels so the sampling scan body does
    # not re-convert every weight f32->bf16 per denoise step (bit-identical)
    params = model.cast_torso_params(load_unet_params(hp.ema_path, model))

    b = hp.test_batch_size
    shape = (b, 1, hp.time_length, hp.latent_length)

    # params enter as a jit ARGUMENT (closing over concrete arrays would
    # inline every weight into the HLO as constants)
    @jax.jit
    def sample(params, key):
        def model_fn(x, t, **kw):
            return model.apply(params, x, t)
        return diffusion.p_sample_loop(model_fn, shape, key)

    gen = sample(params, jax.random.key(hp.get("seed", 0)))[:, 0]  # (B, T, L)

    max_val = np.load(hp.max_val)
    min_val = np.load(hp.min_val)
    gen_latents = unit_interval_to_minmax(gen, float(max_val), float(min_val))

    # decode through the CNF stage (reference reuses the CNF trainer,
    # scripts/inference.py:64-79)
    cnf_hp = cfgmod.basic_input(hp.cnf_case_file_path)
    fptrainer = CNFTrainer(cnf_hp)
    fptrainer.load(-1, siren_only=True)

    decode_bs = hp.get("decode_batch_size", 16)
    fields = []
    for s in range(gen_latents.shape[0]):
        rows = []
        lat = gen_latents[s]
        for i in range(0, lat.shape[0], decode_bs):
            out = fptrainer.infer(fptrainer.train_coord,
                                  lat[i:i + decode_bs])
            rows.append(np.asarray(out))
        fields.append(np.concatenate(rows, axis=0))
    fields = np.stack(fields)

    np.save(hp.save_path, fields)
    print(f"saved generated fields {fields.shape} -> {hp.save_path}")


if __name__ == "__main__":
    main()
