"""Evidence acceptance gates for the committed demo artifacts.

The r03 judge found the old gates "too lenient to mean anything": a
conditional-DPS run with NO held-out field reconstruction (rMAE 0.987 vs a
1.062 unconditional control) passed, and a windowed prior that regressed
unconditional spectra to 21% shipped silently.  These gates encode the
f2-era bar (VERDICT r03 "Next round" items 1-2):

* conditional: absolute field-rMAE threshold AND a real conditioning gain
  over the unconditional control, plus physics gates on the conditional
  ensemble itself (spectra / integral timescale), plus a monotone
  sensor-budget sweep;
* unconditional report: anti-regression bars relative to the best committed
  r03 numbers (spectra 1.79%, timescale ratio 0.885);
* pipeline metrics: the same bars the windowed r3w regression (21% spectra)
  would have tripped.

Gates engage only on provenance-stamped artifacts (``run_dir`` key, written
by the f2-era demo scripts) — pre-f2 artifacts are reported as STALE, not
silently passed.  Reference acceptance anchor: notebook cells 33-39 of
``ConditionalDiffusionGeneration/inference_scripts/Case4/random_sensor/
inference_phy_random_sensor.ipynb`` (sensor traces inside the ensemble band
AND the reconstructed field tracking truth between sensors).

CLI: ``python tools/evidence_gates.py`` checks every committed artifact and
exits non-zero on any failure.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

# --- the f2-era bars -------------------------------------------------------

# conditional DPS experiment (examples/demo_conditional.json)
COND_FIELD_RMAE_MAX = 0.50          # absolute: reconstruct, don't just track
COND_GAIN_MIN = 1.5                 # vs the unconditional control
COND_SENSOR_RMAE_MAX = 0.30
COND_SIGMA3_MIN = 0.90
COND_SPECTRA_MAX = 0.05             # conditional-ensemble physics
COND_TIMESCALE_MIN = 0.70

# unconditional quality report (examples/demo_report.json): anti-regression
# vs the best committed r03 values (spectra 0.0179, timescale ratio 0.885)
REPORT_SPECTRA_MAX = 0.027          # 1.5x the committed best
REPORT_TIMESCALE_RANGE = (0.80, 1.25)

# pipeline quick metrics (examples/demo_metrics.json): the windowed r3w
# regression shipped at 21% spectra / 0.70 ratio — these bars catch it
METRICS_SPECTRA_MAX = 0.05
METRICS_TIMESCALE_MIN = 0.60


class StaleArtifact(Exception):
    """Artifact predates the provenance-stamped (f2-era) demo scripts."""


def _load(name: str) -> dict:
    path = os.path.join(EXAMPLES, name)
    if not os.path.exists(path):
        raise StaleArtifact(f"{name} missing — run the demo pipeline")
    with open(path) as f:
        rep = json.load(f)
    if "run_dir" not in rep:
        raise StaleArtifact(
            f"{name} has no run_dir provenance stamp: it predates the "
            f"f2-era gates and its numbers do not meet the current bar")
    return rep


def check_conditional(rep: dict) -> None:
    """Gate the conditional-DPS evidence (raises AssertionError)."""
    p = rep["protocol"]
    assert p["n_held"] >= 4, f"n_held {p['n_held']} < 4"
    assert p["sensor_fraction"] < 0.05, \
        f"sensor fraction {p['sensor_fraction']} not sparse"
    assert p["n_ens"] >= 4, f"n_ens {p['n_ens']} < 4"
    assert p["held_seed"] != 0, "held-out seed must differ from training"

    assert rep["sensor_rmae_pooled"] < COND_SENSOR_RMAE_MAX, \
        f"sensor rMAE {rep['sensor_rmae_pooled']:.3f} >= {COND_SENSOR_RMAE_MAX}"
    assert rep["sigma3_coverage_pooled"] > COND_SIGMA3_MIN, \
        f"3-sigma coverage {rep['sigma3_coverage_pooled']:.3f} <= {COND_SIGMA3_MIN}"
    for t in rep["per_trajectory"]:
        assert t["sigma3_coverage"] > 0.85, \
            f"trajectory coverage {t['sigma3_coverage']:.3f} <= 0.85"

    # the teeth: absolute reconstruction quality AND gain over the control
    rmae = rep["field_rmae_held_out"]
    gain = rep["conditioning_gain"]
    assert rmae <= COND_FIELD_RMAE_MAX, (
        f"held-out field rMAE {rmae:.3f} > {COND_FIELD_RMAE_MAX}: sensors are "
        f"tracked but the field between them is NOT reconstructed")
    assert gain >= COND_GAIN_MIN, (
        f"conditioning gain {gain:.2f}x < {COND_GAIN_MIN}x over the "
        f"unconditional control — guidance adds no information")

    # conditional-ensemble physics (ungated in r03: shipped at 43% / 0.41)
    assert rep["spectra_relative_error"] <= COND_SPECTRA_MAX, (
        f"conditional-ensemble spectra error "
        f"{rep['spectra_relative_error']:.3f} > {COND_SPECTRA_MAX}")
    assert rep["timescale_ratio"] >= COND_TIMESCALE_MIN, (
        f"conditional timescale ratio {rep['timescale_ratio']:.3f} "
        f"< {COND_TIMESCALE_MIN}")

    # more sensors must help: compare the sparsest to the densest budget
    sweep = rep.get("sensor_sweep") or []
    if len(sweep) >= 2:
        sweep = sorted(sweep, key=lambda r: r["n_sensors"])
        assert sweep[-1]["field_rmae"] < sweep[0]["field_rmae"], (
            f"sensor sweep not improving: rMAE {sweep[0]['field_rmae']:.3f} @ "
            f"{sweep[0]['n_sensors']} sensors vs {sweep[-1]['field_rmae']:.3f} "
            f"@ {sweep[-1]['n_sensors']}")


def check_report(rep: dict) -> None:
    """Gate the unconditional quality report (raises AssertionError)."""
    assert rep["spectra_relative_error"] <= REPORT_SPECTRA_MAX, (
        f"generated-ensemble spectra error {rep['spectra_relative_error']:.4f}"
        f" > {REPORT_SPECTRA_MAX} (anti-regression vs committed 0.0179)")
    lo, hi = REPORT_TIMESCALE_RANGE
    assert lo <= rep["timescale_ratio"] <= hi, (
        f"timescale ratio {rep['timescale_ratio']:.3f} outside [{lo}, {hi}]")
    # the CI must be real (bootstrap ran) and its lower edge sane
    ci = rep.get("spectra_error_ci95")
    assert ci and ci[0] > 0, f"missing/degenerate spectra CI: {ci}"


def check_metrics(rep: dict) -> None:
    """Gate the pipeline quick metrics (raises AssertionError)."""
    assert rep["spectra_relative_error"] <= METRICS_SPECTRA_MAX, (
        f"pipeline spectra error {rep['spectra_relative_error']:.3f} > "
        f"{METRICS_SPECTRA_MAX} (the r3w windowed regression shipped at 0.21)")
    assert rep["timescale_ratio"] >= METRICS_TIMESCALE_MIN, (
        f"pipeline timescale ratio {rep['timescale_ratio']:.3f} < "
        f"{METRICS_TIMESCALE_MIN}")


CHECKS = [
    ("demo_conditional.json", check_conditional),
    ("demo_report.json", check_report),
    ("demo_metrics.json", check_metrics),
]


def main() -> int:
    failures = 0
    for name, check in CHECKS:
        try:
            check(_load(name))
            print(f"PASS  {name}")
        except StaleArtifact as e:
            print(f"STALE {name}: {e}")
            failures += 1
        except AssertionError as e:
            print(f"FAIL  {name}: {e}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
