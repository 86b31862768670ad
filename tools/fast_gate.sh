#!/usr/bin/env bash
# Fast development gate: the quick test selection plus the committed-evidence
# acceptance gates (tools/evidence_gates.py).  The FULL suite (including
# @pytest.mark.slow integration tests) remains the pre-merge bar:
#   python -m pytest tests/ -q
set -uo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -m "not slow" -q "$@"
rc_tests=$?
python tools/evidence_gates.py
rc_gates=$?
python tools/readme_sync.py --check
rc_readme=$?
exit $(( rc_tests || rc_gates || rc_readme ))
