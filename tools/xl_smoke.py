"""case4_xl_768 smoke run on the real chip (VERDICT r02 item 4).

Exercises the ADDITIVE beyond-reference scale recipe end to end at reduced
width: a few diffusion train steps on 768^2 latent images (the shallowest
attention block sees 9216 tokens, where the O(N)-memory Pallas flash
attention auto-enables) plus ONE guided DPS step whose VJP runs through the
flash backward kernel.  The reference caps out at 384^2 with O(N^2)
attention (`src/unet.py:299-305`); this run is the evidence the gradient
path delivers the advertised capability.

Writes examples/xl_smoke.json.  Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/xl_smoke.py [width]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from confild_tpu.core import normalize as cnorm
from confild_tpu.diffusion import create_gaussian_diffusion
from confild_tpu.guidance import (create_sampler, get_conditioning_method,
                                  get_noise)
from confild_tpu.guidance.operators import CNFDecodeOperator
from confild_tpu.models import cnf
from confild_tpu.models import unet as junet


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    hp = yaml.safe_load(open(os.path.join(
        REPO, "recipes", "diffusion", "case4_xl_768.yml")))
    size = hp["image_size"]
    assert size == 768

    model = junet.create_model(
        image_size=size, num_channels=width,  # reduced width; plan identical
        num_res_blocks=hp["num_res_blocks"],
        channel_mult=hp["channel_mult"],
        attention_resolutions=str(hp["attention_resolutions"]),
        num_heads=hp["num_heads"], num_head_channels=hp["num_head_channels"],
        use_flash_attention=hp["use_flash_attention"],  # null -> auto
        use_checkpoint=hp["use_checkpoint"], use_bf16=True)
    flash_blocks = sum(
        spec.use_flash
        for block in (*model.plan.input_blocks, model.plan.middle_block,
                      *model.plan.output_blocks)
        for spec in block if isinstance(spec, junet.AttnSpec))
    assert flash_blocks > 0, "flash auto-gate failed to engage at 768^2"

    params = model.init(jax.random.key(0))
    diffusion = create_gaussian_diffusion(
        steps=hp["steps"], noise_schedule=hp["noise_schedule"])
    opt = optax.adam(hp["lr"])
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, key):
        def loss_fn(p):
            t = jax.random.randint(key, (x.shape[0],), 0,
                                   diffusion.num_timesteps)
            losses = diffusion.training_losses(
                lambda xx, tt, **kw: model.apply(p, xx, tt), x, t,
                jax.random.fold_in(key, 1))
            return jnp.mean(losses["loss"])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    batch = 1  # reduced-width smoke: one 768^2 image per step
    x = jax.random.normal(jax.random.key(1), (batch, 1, size, size)) * 0.5

    t0 = time.perf_counter()
    losses = []
    for i in range(3):
        params, opt_state, loss = train_step(
            params, opt_state, x, jax.random.key(10 + i))
        losses.append(float(loss))
    train_s = time.perf_counter() - t0
    assert all(np.isfinite(losses)), losses

    # one guided DPS step at 768^2: grad through UNet fwd + CNF decode, with
    # the flash BACKWARD kernel in the VJP path of the ds8 attention blocks
    nf = cnf.create_nf("SIRENAutodecoder_film", in_coord_features=3,
                       in_latent_features=size, out_features=3,
                       num_hidden_layers=3, hidden_features=128)
    cparams = nf.init_params(jax.random.key(2))
    sensors = jax.random.uniform(jax.random.key(3), (8, 3))
    xn = cnorm.Normalizer((np.ones(3, np.float32), np.zeros(3, np.float32)),
                          "-11", 0)
    yn = cnorm.Normalizer((np.ones((1, 3), np.float32),
                           -np.ones((1, 3), np.float32)), "-11", 0)
    op = CNFDecodeOperator(cparams, sensors, xn, yn, np.float32(1),
                           np.float32(-1), use_pallas=None)
    meth = get_conditioning_method("ps", op, get_noise("gaussian", sigma=0.0),
                                   scale=1.0)
    sampler = create_sampler("ddpm", steps=4,
                             noise_schedule=hp["noise_schedule"])
    y = jnp.zeros((size, sensors.shape[0], 3))
    img = jnp.zeros((1, 1, size, size))

    @jax.jit
    def guided(params, img):
        return sampler.p_sample_loop(
            lambda xx, tt, **kw: model.apply(params, xx, tt), img, y, meth,
            jax.random.key(4))

    t0 = time.perf_counter()
    out = guided(params, img)
    out = np.asarray(out)
    guided_s = time.perf_counter() - t0
    assert np.isfinite(out).all()

    report = {
        "recipe": "case4_xl_768.yml",
        "image_size": size,
        "reduced_width": width,
        "flash_attention_blocks": int(flash_blocks),
        "train_steps": 3,
        "train_losses": [round(v, 5) for v in losses],
        "train_s_incl_compile": round(train_s, 2),
        "guided_steps": 4,
        "guided_s_incl_compile": round(guided_s, 2),
        "platform": jax.devices()[0].platform,
        "note": ("reduced-width smoke of the beyond-reference 768^2 recipe; "
                 "flash fwd+bwd Pallas kernels engaged at ds8 (9216 tokens)"),
    }
    out_path = os.path.join(REPO, "examples", "xl_smoke.json")
    json.dump(report, open(out_path, "w"), indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
