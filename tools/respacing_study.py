"""Regenerate examples/demo_respacing.json from a completed demo run.

Runs examples/demo_report.py at several sampling step counts (fixed
ensemble size, fixed seeds, bootstrap CIs) and assembles the
steps-vs-physics table — VERDICT r02 item 2 wants the rows monotone
within CI and the gate metric carried with an error bar.

Usage: python tools/respacing_study.py [--out DIR] [--n-gen 256]
       [--steps 100,500,1000]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="demo output dir")
    ap.add_argument("--n-gen", type=int, default=256)
    ap.add_argument("--steps", default="100,500,1000")
    args = ap.parse_args()

    rows = []
    for steps in (int(s) for s in args.steps.split(",")):
        cmd = [sys.executable, os.path.join(REPO, "examples",
                                            "demo_report.py"),
               "--n-gen", str(args.n_gen), "--sample-steps", str(steps)]
        if args.out:
            cmd += ["--out", args.out]
        print("==", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)
        with open(os.path.join(REPO, "examples", "demo_report.json")) as f:
            rep = json.load(f)
        rows.append({
            "sample_steps": steps,
            "n_gen": rep["n_gen"],
            "spectra_relative_error": rep["spectra_relative_error"],
            "spectra_error_ci95": rep["spectra_error_ci95"],
            "integral_timescale_generated":
                rep["integral_timescale_generated"],
            "timescale_ratio": rep["timescale_ratio"],
            "timescale_ratio_ci95": rep["timescale_ratio_ci95"],
        })
        out = {
            "description": (
                "Respacing study: generated-ensemble physics metrics vs "
                "number of sampling steps, fixed ensemble size and seeds, "
                "bootstrap 95% CIs over ensemble members "
                "(tools/respacing_study.py)"),
            "integral_timescale_real": rep["integral_timescale_real"],
            "cnf_recon_spectra_error": rep["cnf_recon_spectra_error"],
            "cnf_rmae": rep["cnf_rmae"],
            "rows": rows,
        }
        with open(os.path.join(REPO, "examples",
                               "demo_respacing.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
