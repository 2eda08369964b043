#!/bin/bash
# Shared launch helpers. The reference pins one scene per GPU via
# CUDA_VISIBLE_DEVICES (scripts/rad_TAT.sh); on TPU each run owns the chip,
# so scenes run sequentially (or distribute across hosts externally).
set -e
DATA=${DATA:-./data}
EXTRA_ARGS=${EXTRA_ARGS:-}
