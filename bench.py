"""Benchmark: Case4 DPS conditional-sampling rate on the current device.

Prints ONE JSON line:
  {"metric": "case4_dps_denoise_steps_per_sec_per_chip", "value": N,
   "unit": "steps/s", "vs_baseline": R}

The workload is the reference's Case4 hot loop (BASELINE.md): a guided DDPM
step on a (1, 1, 384, 384) latent image — ADM UNet (128ch, mult 1,1,2,2,4,4,
attn 32/16/8) forward + misfit VJP through the differentiable CNF decode
(SIREN 15x384) at 10 random sensors.  1000 such steps = one conditional
sample.

``vs_baseline`` is the speedup over a naive translation of the reference's
torch flow on the same chip: f32 torso and a separately-traced second UNet
forward for the guidance gradient (what `condition_methods.py:28-44` does).
Secondary metrics (CNF decode throughput, unconditional fwd rate) go to
stderr.  The reference repo publishes no absolute numbers (BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the two big guided-step programs dominate wall
# time; cached runs finish in ~1 min
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from confild_tpu.core import normalize as cnorm
    from confild_tpu.guidance import (create_sampler,
                                      get_conditioning_method, get_noise)
    from confild_tpu.guidance.operators import CNFDecodeOperator
    from confild_tpu.models import cnf
    from confild_tpu.models import unet as junet
    from confild_tpu.ops import siren_decode as sd

    on_tpu = jax.default_backend() == "tpu"
    size = 384 if on_tpu else 32
    n_sensors = 10
    steps_iters = 5 if on_tpu else 2

    # --- CNF (Case4: SIRENAutodecoder_film(3, 384, 3, 15, 384)) ---
    width = 384 if on_tpu else 32
    layers = 15 if on_tpu else 2
    m = cnf.create_nf("SIRENAutodecoder_film", in_coord_features=3,
                      in_latent_features=width, out_features=3,
                      num_hidden_layers=layers, hidden_features=width)
    cparams = m.init_params(jax.random.key(1))
    sensor_coords = jax.random.uniform(jax.random.key(2), (n_sensors, 3))
    xn = cnorm.Normalizer((np.ones(3, np.float32), np.zeros(3, np.float32)),
                          "-11", 0)
    yn = cnorm.Normalizer((np.ones((1, 3), np.float32),
                           -np.ones((1, 3), np.float32)), "-11", 0)

    def make_operator(cp, use_pallas):
        return CNFDecodeOperator(cp, sensor_coords, xn, yn, np.float32(1),
                                 np.float32(-1), use_pallas=use_pallas)

    y = jnp.zeros((size, n_sensors, 3))
    scan_steps = 25 if on_tpu else 4
    sampler = create_sampler("ddpm", steps=scan_steps,
                             noise_schedule="cosine")
    img = jnp.zeros((1, 1, size, size))

    def make_model(bf16):
        mdl = junet.create_model(
            image_size=size, num_channels=128 if on_tpu else 32,
            num_res_blocks=2 if on_tpu else 1,
            channel_mult="1,1,2,2,4,4" if on_tpu else "1,2",
            attention_resolutions="32,16,8" if on_tpu else "16",
            num_heads=4, num_head_channels=64 if on_tpu else -1,
            use_bf16=bf16)
        return mdl, mdl.init(jax.random.key(0))

    # --- optimized path: bf16 torso, single-traced fwd+vjp, fused decode ---
    model, params = make_model(bf16=True)

    @jax.jit
    def run_fast(params, cparams, img):
        """The real sampler: the whole guided trajectory is ONE lax.scan."""
        op = make_operator(cparams, use_pallas=on_tpu)
        meth = get_conditioning_method("ps", op, get_noise("gaussian",
                                                           sigma=0.0),
                                       scale=1.0)
        def model_fn(x, t, **kw):
            return model.apply(params, x, t)
        return sampler.p_sample_loop(model_fn, img, y, meth,
                                     jax.random.key(0))

    dt_fast = _bench(run_fast, params, cparams, img,
                     iters=max(steps_iters // 2, 1)) / scan_steps
    log(f"DPS step (optimized, scan-amortized): {dt_fast*1e3:.1f} ms "
        f"-> {dt_fast*1000:.1f} s per 1000-step sample")

    # --- naive baseline: f32 torso + double-traced guidance graph ---
    model32, params32 = make_model(bf16=False)

    @jax.jit
    def run_naive(params, cparams, img):
        op = make_operator(cparams, use_pallas=False)
        meth = get_conditioning_method("ps", op, get_noise("gaussian",
                                                           sigma=0.0),
                                       scale=1.0)
        def model_fn(x, t, **kw):
            return model32.apply(params, x, t)

        def step(im, i):
            t = jnp.full((1,), i, jnp.int32)
            # double-trace: one fwd for the sample, an independent fwd+bwd
            # for the guidance gradient (the reference's autograd structure)
            out = sampler._inner_sample(model_fn, im, t, jax.random.key(0))
            def x0_from_prev(xp):
                return sampler._inner_sample(
                    model_fn, xp, t, jax.random.key(0))["pred_xstart"]
            grad, _ = meth.grad_and_value(im, x0_from_prev, y)
            return out["sample"] - grad, None

        ts = jnp.arange(scan_steps - 1, -1, -1)
        return jax.lax.scan(step, img, ts)[0]

    dt_naive = _bench(run_naive, params32, cparams, img,
                      iters=max(steps_iters // 2, 1)) / scan_steps
    log(f"DPS step (naive translation): {dt_naive*1e3:.1f} ms")

    # --- secondary: CNF decode throughput ---
    n_rows, n_pts = (16, 262144) if on_tpu else (4, 4096)
    coords_big = jax.random.uniform(jax.random.key(3), (n_pts, 3))
    latents = jax.random.normal(jax.random.key(4), (n_rows, width)) * 0.1
    fused = jax.jit(lambda p, c, z: sd.fused_siren_decode(p, c, z))
    dt_dec = _bench(fused, cparams, coords_big, latents, iters=steps_iters)
    log(f"CNF decode: {n_rows*n_pts/dt_dec/1e6:.1f} Mpts/s (fused kernel)")

    print(json.dumps({
        "metric": "case4_dps_denoise_steps_per_sec_per_chip",
        "value": round(1.0 / dt_fast, 2),
        "unit": "steps/s",
        "vs_baseline": round(dt_naive / dt_fast, 3),
    }))


if __name__ == "__main__":
    main()
