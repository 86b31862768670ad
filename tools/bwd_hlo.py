"""Dump the optimized HLO of the mfu_probe UNet fwd+input-grad scan and
attribute the backward's f32 activation-size tensors (compile-only — safe
to run concurrently with a training job on the tunnel).

Writes /tmp/bwd_opt.hlo and prints every instruction producing an f32
tensor >= 8 MB, grouped by op kind, so the dtype leak in the bf16 torso's
backward can be located (r04 trace showed f32 pads/copies of
[384,1,392,128] — activation-size at ds1 — in the bwd but not the fwd).

Usage: timeout 600 python tools/bwd_hlo.py [fwd|bwd]
"""
import collections
import re
import sys
import os

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.mfu_probe import SCAN, SIZE, _unet  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "bwd"
    model, params = _unet(False, "full")
    img = jnp.zeros((1, 1, SIZE, SIZE))
    t = jnp.full((1,), 10, jnp.int32)

    def fwd_body(x):
        return model.apply(params, x, t)[:, :1] * 1e-3 + x

    def grad_body(x):
        def f(xx):
            return jnp.sum(model.apply(params, xx, t)[:, :1]
                           .astype(jnp.float32))
        return jax.grad(f)(x) * 1e-3 + x

    body = grad_body if which == "bwd" else fwd_body

    @jax.jit
    def fn(x):
        def step(x, _):
            return body(x), None
        return jax.lax.scan(step, x, jnp.arange(SCAN))[0]

    print("lower+compile ...", flush=True)
    compiled = fn.lower(img).compile()
    txt = compiled.as_text()
    path = f"/tmp/{which}_opt.hlo"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path} ({len(txt)/1e6:.1f} MB)")

    # every instruction "%name = f32[dims]{layout} op(...)" with size >= 8MB
    pat = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = f32\[([\d,]+)\]\S* (\w+)")
    by_kind = collections.Counter()
    examples = collections.defaultdict(list)
    for line in txt.splitlines():
        m = pat.match(line)
        if not m:
            continue
        name, dims, kind = m.groups()
        n = 1
        for d in dims.split(","):
            n *= int(d)
        mb = n * 4 / 1e6
        if mb < 8:
            continue
        by_kind[kind] += 1
        if len(examples[kind]) < 4:
            examples[kind].append(f"{name}: f32[{dims}] {mb:.0f}MB")
    print(f"\n== f32 tensors >= 8MB in {which} optimized HLO ==")
    for kind, cnt in by_kind.most_common():
        print(f"{kind:20s} x{cnt}")
        for e in examples[kind]:
            print(f"   {e}")


if __name__ == "__main__":
    main()
