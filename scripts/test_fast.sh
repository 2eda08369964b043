#!/usr/bin/env bash
# Fast test tier: unit/golden tests only (< 5 min on a 2-core host).
# The slow tier (pytest -m slow: trainer e2e, Pallas interpret-mode kernel
# parity, orbax IO, MoE union sampling) brings the full suite to ~45 min
# here — run it as `python -m pytest tests/ -q` before a release.
set -euo pipefail
cd "$(dirname "$0")/.."
# Strip any accelerator plugin BEFORE interpreter start: plugins register
# at import time (a conftest cannot undo it), and a single-client device
# tunnel held by the test run would wedge concurrent training/bench jobs.
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q -m "not slow" --durations=10 "$@"
