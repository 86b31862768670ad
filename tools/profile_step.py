"""Profile the Case4 guided DPS step on the real chip and print the XLA op
breakdown (tensorboard_plugin_profile offline parse) — drives the r03 MFU
work (VERDICT: raise step MFU 0.37 -> >=0.50)."""
import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from confild_tpu.core import normalize as cnorm
from confild_tpu.guidance import (create_sampler, get_conditioning_method,
                                  get_noise)
from confild_tpu.guidance.operators import CNFDecodeOperator
from confild_tpu.models import cnf
from confild_tpu.models import unet as junet


def build(scan_steps=25, use_checkpoint=False):
    size, width, layers, n_sensors = 384, 384, 15, 10
    m = cnf.create_nf("SIRENAutodecoder_film", in_coord_features=3,
                      in_latent_features=width, out_features=3,
                      num_hidden_layers=layers, hidden_features=width)
    cparams = m.init_params(jax.random.key(1))
    sensor_coords = jax.random.uniform(jax.random.key(2), (n_sensors, 3))
    xn = cnorm.Normalizer((np.ones(3, np.float32), np.zeros(3, np.float32)),
                          "-11", 0)
    yn = cnorm.Normalizer((np.ones((1, 3), np.float32),
                           -np.ones((1, 3), np.float32)), "-11", 0)
    op = CNFDecodeOperator(cparams, sensor_coords, xn, yn, np.float32(1),
                           np.float32(-1), use_pallas=None)
    meth = get_conditioning_method("ps", op, get_noise("gaussian", sigma=0.0),
                                   scale=1.0)
    model = junet.create_model(
        image_size=size, num_channels=128, num_res_blocks=2,
        channel_mult="1,1,2,2,4,4", attention_resolutions="32,16,8",
        num_heads=4, num_head_channels=64, use_bf16=True,
        use_checkpoint=use_checkpoint)
    params = model.init(jax.random.key(0))
    sampler = create_sampler("ddpm", steps=scan_steps, noise_schedule="cosine")
    y = jnp.zeros((size, n_sensors, 3))
    img = jnp.zeros((1, 1, size, size))
    return model, params, cparams, sampler, meth, y, img


def parse(mode):
    """Offline xplane -> op-stats CSV; run with
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the fast proto runtime
    rejects the plugin's mixed descriptors, while the pure-python one is
    too slow for the JAX runtime itself - so parsing lives in its own
    process)."""
    xs = sorted(glob.glob(f"/tmp/trace_{mode}/**/*.xplane.pb",
                          recursive=True))
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd
    data, _ = rttd.xspace_to_tool_data([xs[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = gzip.decompress(data).decode()
    open(f"/tmp/opstats_{mode}.csv", "w").write(data)
    print(f"op stats -> /tmp/opstats_{mode}.csv")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    if mode.startswith("parse:"):
        return parse(mode.split(":", 1)[1])
    scan_steps = 25
    model, params, cparams, sampler, meth, y, img = build(scan_steps)

    if mode == "fwd":     # scan-amortized UNet forward (tunnel adds ~0.5 s
        # per dispatch, so single invocations measure the relay, not the op)
        @jax.jit
        def fn(params, img):
            def body(x, i):
                t = jnp.full((1,), 10, jnp.int32)
                out = model.apply(params, x, t)
                return out[:, :1] * 1e-3 + x, None
            return jax.lax.scan(body, img, jnp.arange(scan_steps))[0]
    elif mode == "vjp":   # scan-amortized fwd+bwd (input cotangent only)
        @jax.jit
        def fn(params, img):
            def body(x, i):
                t = jnp.full((1,), 10, jnp.int32)
                def f(xx):
                    return jnp.sum(model.apply(params, xx, t)[:, :1]
                                   .astype(jnp.float32))
                return jax.grad(f)(x) * 1e-3 + x, None
            return jax.lax.scan(body, img, jnp.arange(scan_steps))[0]
    else:                 # the real guided step inside a scan
        @jax.jit
        def fn(params, img):
            def model_fn(x, t, **kw):
                return model.apply(params, x, t)
            return sampler.p_sample_loop(model_fn, img, y, meth,
                                         jax.random.key(0))

    out = fn(params, img)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(params, img)
    _ = float(jnp.sum(out))          # force host read (tunnel)
    dt = time.perf_counter() - t0
    per = dt / scan_steps
    print(f"[{mode}] {per*1e3:.2f} ms /step")

    trace_dir = f"/tmp/trace_{mode}"
    with jax.profiler.trace(trace_dir):
        out = fn(params, img)
        jax.block_until_ready(out)

    xs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    print("xplane:", xs[-1] if xs else None)


if __name__ == "__main__":
    main()
