"""Regenerate the README performance table from the newest BENCH_r*.json.

The r02-r04 verdicts each flagged README/driver drift (hand-synced numbers
going stale the moment a new bench lands).  This script makes the table
DERIVED state: it parses the latest driver-captured bench record and
rewrites the block between the ``<!-- BENCH:BEGIN -->`` /
``<!-- BENCH:END -->`` markers.  It runs inside ``tools/fast_gate.sh`` in
``--check`` mode, so a stale README fails the every-edit gate.

Usage:
    python tools/readme_sync.py            # rewrite README in place
    python tools/readme_sync.py --check    # exit 1 if README is stale
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"


def latest_bench() -> tuple[str, dict]:
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        raise SystemExit("no BENCH_r*.json found")
    path = paths[-1]
    with open(path) as f:
        rec = json.load(f)
    parsed = rec.get("parsed")
    if not parsed:
        # fall back to the last JSON line of the captured tail
        for line in reversed(rec.get("tail", "").splitlines()):
            line = line.strip()
            if line.startswith("{"):
                parsed = json.loads(line)
                break
    if not parsed:
        raise SystemExit(f"{path} has no parsed bench record")
    return os.path.basename(path), parsed


def render(src: str, p: dict) -> str:
    mfu = p["step_mfu"] * 100
    band = p.get("vs_baseline_sensitivity", {})
    lines = [
        BEGIN,
        f"Source: `{src}` (driver-captured `python bench.py` on "
        f"{p.get('device_kind', 'TPU')}). Regenerate with "
        "`python tools/readme_sync.py`.",
        "",
        "| Workload | Absolute | Measured | Estimated vs A100 anchor |",
        "|---|---|---|---|",
        (
            "| Case4 DPS guided sampling (384² latent image, UNet fwd+VJP+"
            "CNF-decode grad per step, whole trajectory one scan) | "
            f"{p['value']:.1f} steps/s; {p['step_tflops_achieved']:.1f} "
            f"TFLOP/s = {mfu:.1f}% of v5e bf16 peak | "
            f"**{p['vs_naive_jax']:.2f}× naive-JAX** | "
            f"{p['vs_baseline']:.2f}× (band "
            f"{band.get('util_0.45', 0):.2f}×–{band.get('util_0.25', 0):.2f}× "
            "over util 0.45–0.25) |"
        ),
        (
            "| Case4 **end-to-end sample** (1000 guided steps + full "
            "384-row × 262144-pt field decode) | "
            f"{p['case4_sample_seconds_e2e']:.1f} s wall | — | "
            f"{p['vs_baseline_e2e']:.2f}× (same assumption) |"
        ),
        (
            "| Fused CNF decode (SIREN 15×384, Case4 scale, 4.2M point-rows)"
            f" | {p['decode_mpts_per_s']:.1f} Mpts/s = "
            f"{p['decode_tflops_achieved']:.1f} TFLOP/s = "
            f"{p['decode_mfu'] * 100:.0f}% of v5e bf16 peak | "
            "**4.7× XLA layerwise** (r2 measurement) | — |"
        ),
        (
            "| CNF auto-decoding training (case2 scale, fused Pallas path) "
            "| 155 ms/epoch warm (r2 measurement) | **163× the round-1 "
            "layerwise path** | — |"
        ),
    ]
    xl = p.get("xl")
    if xl:
        lines.append(
            f"| **xl-768** guided sampling ({xl['image_size']}² latent "
            f"image, width {xl['width']}, beyond-reference scale) | "
            f"{xl['guided_steps_per_s']:.2f} steps/s = "
            f"{xl['guided_mfu'] * 100:.1f}% MFU; train "
            f"{xl['train_steps_per_s']:.2f} steps/s | flash vs dense "
            f"attention: {xl['flash_vs_dense']:.2f}× at "
            f"{(xl['image_size'] // 8) ** 2} tokens | — |"
        )
    lines.append(
        "| Flash attention (Pallas fwd+bwd) | O(N) memory: no (BH,N,N) "
        "score matrix in fwd or VJP (dense needs ~1.4 GB/block at 9216 "
        "tokens) | dense XLA attention remains competitive at the scales "
        "measured; used above `FLASH_MIN_TOKENS` for its memory ceiling "
        "| — |"
    )
    lines.append(END)
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify README is in sync; do not write")
    args = ap.parse_args()

    src, parsed = latest_bench()
    block = render(src, parsed)

    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        raise SystemExit(f"README.md is missing the {BEGIN} markers")
    new = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block, text,
                 flags=re.S)
    if args.check:
        if new != text:
            print("README.md perf table is stale — run "
                  "python tools/readme_sync.py", file=sys.stderr)
            return 1
        print("README.md perf table in sync with", src)
        return 0
    if new != text:
        with open(readme, "w") as f:
            f.write(new)
        print(f"README.md perf table regenerated from {src}")
    else:
        print("README.md already in sync with", src)
    return 0


if __name__ == "__main__":
    sys.exit(main())
