#!/usr/bin/env bash
# Round-5 full-scale quality queue (VERDICT round-4 "Next round" #2/#3):
# T=2^19, L=16, grid 128, MoE zoo=2 on the hard multi-object procedural
# scene, real TPU chip, shipped defaults (adaptive union budget).
#   1. primary @ the new TPU default impl (brick3), reference batch 8192
#   2. hash exactness A/B >= 1000 steps: tcnn-exact dedup @ batch 2048
#      (dedup is ~12x slower; batch 2048 keeps wall-clock sane)
#   3. matched-batch brick3 pair for (2)
# Runs are sequential (single-client TPU tunnel).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
COMMON="hard --log2_T 19 --levels 16 --eval_every 100 --render union"

python -u examples/convergence.py $COMMON --steps 2000 --batch 8192 \
    --impl brick3 \
    --out docs/curves/hard_brick3_union_autoK.jsonl 2>&1
echo "=== run 1 exit $? ==="
python -u examples/convergence.py $COMMON --steps 1200 --batch 2048 \
    --impl dedup \
    --out docs/curves/hard_dedup_union_b2048.jsonl 2>&1
echo "=== run 2 exit $? ==="
python -u examples/convergence.py $COMMON --steps 1200 --batch 2048 \
    --impl brick3 \
    --out docs/curves/hard_brick3_union_b2048.jsonl 2>&1
echo "=== run 3 exit $? ==="
