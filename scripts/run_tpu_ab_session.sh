#!/bin/bash
# Serialized TPU pass: paired interleaved A/B for the serving-tier table
# (PARITY.md "int8 tiers" re-stated as paired ratios; round-3 VERDICT
# weak #5b). One process per family pair, 2 compiles each, run back to
# back so the relay chip is claimed once at a time.
set -x
cd "$(dirname "$0")/.."
python scripts/bench_serve.py --ab bf16,int8 --batch 128 --iters 30 --ab_rounds 5
python scripts/bench_serve.py --ab bf16,int8 --model_type vittiny --batch 128 --iters 30 --ab_rounds 5
python scripts/bench_serve.py --ab bf16,int8 --model_type mobilenetv3 --batch 128 --iters 30 --ab_rounds 5
python scripts/bench_serve.py --ab bf16,int8_mixed --model_type resnet50 --batch 64 --iters 20 --ab_rounds 5
echo AB_SESSION_DONE
