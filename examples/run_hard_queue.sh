#!/usr/bin/env bash
# Round-4 full-scale quality-parity queue (VERDICT round-3 "Next round" #3):
# T=2^19, L=16, grid 128, MoE zoo=2, batch 8192 (2-way grad accumulation)
# on the hard multi-object procedural scene, on the real TPU chip.
#   1. primary:  brick impl (TPU default) + union sampling
#   2. hash A/B: dedup impl (tcnn-exact xor hash semantics) + union
#   3. render A/B: brick + per-expert marches (reference ml_render loop)
# Runs are sequential (single-client TPU tunnel).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
COMMON="hard --batch 8192 --log2_T 19 --levels 16 --eval_every 100"

python -u examples/convergence.py $COMMON --steps 2000 \
    --impl brick --render union \
    --out docs/curves/hard_brick_union.jsonl 2>&1
echo "=== run 1 exit $? ==="
python -u examples/convergence.py $COMMON --steps 1200 \
    --impl dedup --render union \
    --out docs/curves/hard_dedup_union.jsonl 2>&1
echo "=== run 2 exit $? ==="
python -u examples/convergence.py $COMMON --steps 1200 \
    --impl brick --render per_expert \
    --out docs/curves/hard_brick_perexpert.jsonl 2>&1
echo "=== run 3 exit $? ==="
