#!/usr/bin/env bash
# Fast test tier: unit/golden tests only (< 5 min on a 2-core host).
# The slow tier (pytest -m slow: trainer e2e, Pallas interpret-mode kernel
# parity, orbax IO, MoE union sampling) brings the full suite to ~45 min
# here — run it as `python -m pytest tests/ -q` before a release.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "not slow" --durations=10 "$@"
