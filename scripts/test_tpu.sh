#!/usr/bin/env bash
# TPU-semantics exactness tier: runs the tpu-marked tests ON THE REAL
# DEVICE, where default matmul precision truncates f32 operands to bf16.
# These tests exist because CPU true-f32 matmuls cannot detect TPU
# truncation bugs (ADVICE r4 medium). Single-client tunnel: do not run
# concurrently with a bench/train job.
set -euo pipefail
cd "$(dirname "$0")/.."
exec env RADNERF_TPU_TESTS=1 \
    python -m pytest tests/ -q -m tpu --durations=5 "$@"
