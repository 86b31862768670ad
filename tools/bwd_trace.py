"""Per-op attribution of the UNet input-grad backward's missing MFU.

Traces the exact mfu_probe UNet (384^2, ch 128, bf16 torso, no attention)
twice — fwd-only scan and fwd+input-grad scan — and prints each trace's
top XLA ops via tools/xplane_ops.py's parser.  The fwd ops appear in both;
whatever dominates the second trace but not the first is the backward's
real cost (r03: bwd ~19 ms vs fwd 9.4 ms at equal FLOPs).

Usage: timeout 580 python tools/bwd_trace.py [top_n]
"""
import os
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.mfu_probe import SCAN, SIZE, _unet  # noqa: E402
from tools.xplane_ops import classify, device_op_times, load  # noqa: E402


def top_ops(trace_dir, fn, x, top_n):
    out = fn(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # warm
    with jax.profiler.trace(trace_dir):
        out = fn(x)
        _ = float(jnp.sum(out.astype(jnp.float32)))
    per_op, _tot = device_op_times(load(trace_dir))
    # drop the module/while wrappers that double-count every inner op
    per_op = {n: ps for n, ps in per_op.items()
              if not (n.startswith("jit_") or n.startswith("%while"))}
    total = sum(per_op.values())
    import collections
    cats = collections.Counter()
    for n, ps in per_op.items():
        cats[classify(n)] += ps
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]
    return rows, cats, total


def main():
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    model, params = _unet(False, "full")
    img = jnp.zeros((1, 1, SIZE, SIZE))
    t = jnp.full((1,), 10, jnp.int32)

    @jax.jit
    def fwd(x):
        def step(x, _):
            return model.apply(params, x, t)[:, :1] * 1e-3 + x, None
        return jax.lax.scan(step, x, jnp.arange(SCAN))[0]

    @jax.jit
    def fwdbwd(x):
        def step(x, _):
            def f(xx):
                return jnp.sum(model.apply(params, xx, t)[:, :1]
                               .astype(jnp.float32))
            return jax.grad(f)(x) * 1e-3 + x, None
        return jax.lax.scan(step, x, jnp.arange(SCAN))[0]

    for tag, fn in (("FWD", fwd), ("FWD+BWD", fwdbwd)):
        rows, cats, total = top_ops(f"/tmp/trace_{tag}", fn, img, top_n)
        print(f"\n== {tag}: device op-time total {total/1e9/SCAN:.3f} ms/step ==")
        for c, ps in cats.most_common():
            print(f"  [{c:26s}] {ps/1e9/SCAN:8.4f} ms  {100*ps/total:5.1f}%")
        for name, ps in rows:
            print(f"  {ps/1e9/SCAN:8.4f} ms  {100*ps/total:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
