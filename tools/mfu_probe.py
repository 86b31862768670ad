"""Isolate where the Case4 guided-step BACKWARD loses efficiency.

r03 facts: UNet forward 9.4 ms (60% MFU), input-grad backward ~19 ms
(~30% MFU) at EQUAL FLOPs (XLA cost analysis: fwd 1.114 T, fwd+bwd
2.256 T) — the backward moves ~1.6x the bytes and runs at half the
forward's rate.  Each probe times one suspect in isolation, scan-amortized
(the axon tunnel adds ~29 ms per host sync), bf16, at the exact bench
shapes (384^2, ch 128).

Usage: python tools/mfu_probe.py [probe ...]
Probes: conv, gn, resblock, updown, unet, unet_nofuse, unet_remat, all.
Run unet_nofuse with CONFILD_GN_FUSED=0 set automatically (subprocess).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confild_tpu.models import nn as tnn
from confild_tpu.models import unet as junet

SCAN = 25
SIZE = 384


def bench_scan(body, x0, iters=2):
    """Time SCAN repetitions of ``body`` folded into one lax.scan."""
    @jax.jit
    def fn(x):
        def step(x, _):
            return body(x), None
        return jax.lax.scan(step, x, jnp.arange(SCAN))[0]

    out = fn(x0)
    _ = float(jnp.sum(out.astype(jnp.float32)))   # warm + force host read
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(x0)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / SCAN)
    return best


def probe_conv():
    """A single ds1-scale 3x3 conv: fwd vs input-grad, bf16 channels-last."""
    key = jax.random.key(0)
    p = tnn.init_conv(key, 2, 128, 128)
    p = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
    x = jax.random.normal(key, (1, SIZE, SIZE, 128), jnp.bfloat16)

    flops = 2 * 9 * 128 * 128 * SIZE * SIZE
    t_f = bench_scan(lambda x: tnn.conv(p, x), x)
    print(f"conv fwd    : {t_f*1e3:7.3f} ms  {flops/t_f/1e12:6.1f} TFLOP/s")

    def g(x):
        return jax.grad(lambda xx: jnp.sum(
            tnn.conv(p, xx).astype(jnp.float32)))(x)
    t_g = bench_scan(g, x)
    # grad = fwd (recomputed? no: sum grad needs no fwd values -> pure dgrad)
    print(f"conv dgrad  : {t_g*1e3:7.3f} ms  {flops/t_g/1e12:6.1f} TFLOP/s "
          f"(ratio {t_g/t_f:.2f})")


def probe_gn():
    """Fused GN+SiLU custom VJP vs open XLA chain, fwd and bwd, ds1 scale."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, SIZE, SIZE, 128), jnp.bfloat16)
    p = {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))}

    for name, env in (("fused", "1"), ("xla  ", "0")):
        os.environ["CONFILD_GN_FUSED"] = env
        t_f = bench_scan(lambda x: tnn.group_norm_silu(p, x), x)

        def g(x):
            return jax.grad(lambda xx: jnp.sum(
                tnn.group_norm_silu(p, xx).astype(jnp.float32)))(x)
        t_g = bench_scan(g, x)
        print(f"gn+silu {name}: fwd {t_f*1e3:7.3f} ms   fwd+bwd "
              f"{t_g*1e3:7.3f} ms")
    os.environ["CONFILD_GN_FUSED"] = "1"


def _resblock():
    spec = junet.ResSpec(2, 128, 128, 512, use_scale_shift_norm=False)
    p = junet._init_layer(jax.random.key(0), spec)
    # bf16 torso kernels as the model would run them
    for k in ("in_conv", "out_conv"):
        p[k] = {n: v.astype(jnp.bfloat16) for n, v in p[k].items()}
    emb = jax.random.normal(jax.random.key(1), (1, 512))
    return spec, p, emb


def probe_resblock():
    """One ds1 ResBlock fwd vs fwd+input-grad."""
    spec, p, emb = _resblock()
    x = jax.random.normal(jax.random.key(2), (1, SIZE, SIZE, 128),
                          jnp.bfloat16)
    t_f = bench_scan(lambda x: junet._apply_layer(p, spec, x, emb), x)

    def g(x):
        return jax.grad(lambda xx: jnp.sum(junet._apply_layer(
            p, spec, xx, emb).astype(jnp.float32)))(x)
    t_g = bench_scan(g, x)
    print(f"resblock ds1: fwd {t_f*1e3:7.3f} ms   grad {t_g*1e3:7.3f} ms "
          f"(bwd ~= {(t_g-t_f)*1e3:7.3f} ms, ratio {(t_g-t_f)/t_f:.2f})")


def probe_updown():
    """Strided downsample conv + nearest-upsample conv: fwd vs input-grad."""
    key = jax.random.key(0)
    pd = {k: v.astype(jnp.bfloat16)
          for k, v in tnn.init_conv(key, 2, 128, 128).items()}
    x = jax.random.normal(key, (1, SIZE, SIZE, 128), jnp.bfloat16)

    def down(x):
        return tnn.conv(pd, x, stride=2, padding=1)

    # keep the scan carry input-shaped: cheap nearest-upsample of the output
    t_f = bench_scan(
        lambda x: x + 1e-3 * tnn.nearest_upsample(down(x), 2), x)

    def gd(x):
        return jax.grad(lambda xx: jnp.sum(down(xx).astype(jnp.float32)))(x)
    t_g = bench_scan(gd, x)
    print(f"down conv   : fwd(+up) {t_f*1e3:7.3f} ms   dgrad {t_g*1e3:7.3f} "
          f"ms (ratio {t_g/t_f:.2f})")

    xh = jax.random.normal(key, (1, SIZE // 2, SIZE // 2, 128), jnp.bfloat16)

    def up(x):
        return tnn.conv(pd, tnn.nearest_upsample(x, 2))
    t_f = bench_scan(lambda x: x + 1e-3 * tnn.avg_pool(up(x), (2, 2)), xh)

    def gu(x):
        return jax.grad(lambda xx: jnp.sum(up(xx).astype(jnp.float32)))(x)
    t_g = bench_scan(gu, xh)
    print(f"up conv     : fwd(+pool) {t_f*1e3:7.3f} ms   dgrad {t_g*1e3:7.3f}"
          f" ms (ratio {t_g/t_f:.2f})")


def _unet(use_checkpoint=False, remat_policy="full"):
    model = junet.create_model(
        image_size=SIZE, num_channels=128, num_res_blocks=2,
        channel_mult="1,1,2,2,4,4", attention_resolutions="32,16,8",
        num_heads=4, num_head_channels=64, use_bf16=True,
        use_checkpoint=use_checkpoint, remat_policy=remat_policy)
    params = model.cast_torso_params(model.init(jax.random.key(0)))
    return model, params


def probe_unet(use_checkpoint=False, remat_policy="full", tag="unet",
               batch=1, conv_bwd="xla"):
    """Per-SAMPLE fwd and fwd+input-grad times at the bench shapes.

    ``batch`` > 1 tests the batch-in-sublanes hypothesis: at B=1 the conv
    emitter puts a spatial dim in the sublanes and the bwd HLO is ~half
    layout copies/pads (retiling 49<->50-tile buffers around every conv
    data-grad at ds1/ds2); with B >= 8 the batch fills the sublanes and
    the spatial retiling churn should vanish."""
    from confild_tpu.models import nn as tnn
    tnn.set_conv_bwd_mode(conv_bwd)  # shifted-matmul conv backward A/B
    model, params = _unet(use_checkpoint, remat_policy)
    img = jnp.zeros((batch, 1, SIZE, SIZE))
    t = jnp.full((batch,), 10, jnp.int32)

    def fwd_body(x):
        return model.apply(params, x, t)[:, :1] * 1e-3 + x
    t_f = bench_scan(fwd_body, img) / batch

    def grad_body(x):
        def f(xx):
            return jnp.sum(model.apply(params, xx, t)[:, :1]
                           .astype(jnp.float32))
        return jax.grad(f)(x) * 1e-3 + x
    t_g = bench_scan(grad_body, img) / batch
    tnn.set_conv_bwd_mode("xla")
    print(f"{tag:12s}: fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_g*1e3:7.2f} ms "
          f"(bwd ~= {(t_g-t_f)*1e3:7.2f} ms, bwd/fwd {(t_g-t_f)/t_f:.2f})"
          + (f"  [per sample, batch {batch}]" if batch > 1 else ""))


PROBES = {
    "conv": probe_conv,
    "gn": probe_gn,
    "resblock": probe_resblock,
    "updown": probe_updown,
    "unet": lambda: probe_unet(False, "full", "unet"),
    "unet_remat": lambda: probe_unet(True, "matmuls", "unet_remat"),
    "unet_remat_stats": lambda: probe_unet(True, "matmuls+stats",
                                           "unet_remat_stats"),
    "unet_b4": lambda: probe_unet(False, "full", "unet_b4", batch=4),
    "unet_b8": lambda: probe_unet(False, "full", "unet_b8", batch=8),
    "unet_b8_remat": lambda: probe_unet(True, "matmuls", "unet_b8_remat",
                                        batch=8),
    "unet_b10_remat": lambda: probe_unet(True, "matmuls", "unet_b10_remat",
                                         batch=10),
    "unet_mm": lambda: probe_unet(False, "full", "unet_mm", conv_bwd="mm"),
    "unet_b10_mm": lambda: probe_unet(True, "matmuls", "unet_b10_mm",
                                      batch=10, conv_bwd="mm"),
}


def main():
    args = sys.argv[1:] or ["all"]
    if "unet_nofuse" in args or "all" in args:
        # the env var must be set before tracing; run in a subprocess so the
        # fused run in THIS process isn't polluted
        env = dict(os.environ, CONFILD_GN_FUSED="0")
        r = subprocess.run(
            [sys.executable, __file__, "unet"], env=env,
            capture_output=True, text=True)
        line = [l for l in r.stdout.splitlines() if l.startswith("unet")]
        print(f"unet_nofuse : {line[0].split(':', 1)[1].strip()}"
              if line else f"unet_nofuse failed: {r.stderr[-300:]}")
        args = [a for a in args if a != "unet_nofuse"]
    names = list(PROBES) if args == ["all"] else args
    for n in names:
        PROBES[n]()


if __name__ == "__main__":
    main()
