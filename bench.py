"""Benchmark: CNF decode throughput at Case4 scale on the current device.

Prints ONE JSON line:
  {"metric": "cnf_decode_mpts_per_s", "value": N, "unit": "Mpts/s",
   "vs_baseline": R}

where vs_baseline is the speedup of the fused Pallas decode over the
layer-by-layer XLA implementation of the same math measured in the same run
(the reference publishes no absolute throughput numbers — BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp


def _bench(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from confild_tpu.models import cnf
    from confild_tpu.ops import siren_decode as sd

    on_tpu = jax.default_backend() == "tpu"
    # Case4 CNF: SIRENAutodecoder_film(3, 384, 3, 15, 384)
    # (reference measurements.py:207); decode batch of latent rows over a
    # coordinate chunk, the DPS hot kernel.
    if on_tpu:
        n_rows, n_pts = 16, 262144
    else:  # CI-scale fallback
        n_rows, n_pts = 4, 4096

    model = cnf.create_nf(
        "SIRENAutodecoder_film", in_coord_features=3, in_latent_features=384,
        out_features=3, num_hidden_layers=15, hidden_features=384)
    params = model.init_params(jax.random.key(0))
    coords = jax.random.uniform(jax.random.key(1), (n_pts, 3))
    latents = jax.random.normal(jax.random.key(2), (n_rows, 384)) * 0.1

    fused = jax.jit(lambda c, z: sd.fused_siren_decode(params, c, z))
    ref = jax.jit(lambda c, z: sd.siren_decode(params, c, z, use_pallas=False))

    iters = 10 if on_tpu else 2
    dt_fused = _bench(fused, coords, latents, iters=iters)
    dt_ref = _bench(ref, coords, latents, iters=iters)

    mpts = n_rows * n_pts / dt_fused / 1e6
    print(json.dumps({
        "metric": "cnf_decode_mpts_per_s",
        "value": round(mpts, 2),
        "unit": "Mpts/s",
        "vs_baseline": round(dt_ref / dt_fused, 3),
    }))


if __name__ == "__main__":
    main()
