#!/bin/bash
# Serialized TPU serving measurement session (round 3, post int8-verdict).
# Measures the XLA-route int8 tier (dot-lowered 1x1 convs, prequantized
# weights, BN folding, optional calibration+chaining) against bf16, and a
# bf16 batch-size sweep for the latency/throughput table. One process at
# a time, few compiles each (relay rules - CLAUDE.md).
# Usage: bash scripts/run_tpu_serve_session.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/serve_session}
mkdir -p "$OUT"

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/session.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))" \
    | tee -a "$OUT/session.log"
}

# 1. int8 XLA route, dynamic + calibrated, ResNet18 flagship
run serve_int8_rn18 python scripts/bench_serve.py --int8 \
  --batch 128 --iters 10
run serve_int8_rn18_calib python scripts/bench_serve.py --int8 \
  --calibrate --batch 128 --iters 10

# 2. ResNet50: the 1x1-heavy family (dot-lowering matters most) + the
#    VMEM-OOM regression check for the opt-in Pallas kernels
run serve_int8_rn50 python scripts/bench_serve.py --model_type resnet50 \
  --int8 --batch 128 --iters 10
run serve_int8_rn50_calib python scripts/bench_serve.py \
  --model_type resnet50 --int8 --calibrate --batch 128 --iters 10

# 3. ViT: dense-dominated, XLA s8 dot_general everywhere
run serve_int8_vit python scripts/bench_serve.py --model_type vittiny \
  --int8 --batch 128 --iters 10

# 4. bf16 latency/throughput curve (serving table for PARITY.md)
for B in 1 8 32; do
  run serve_bf16_b$B python scripts/bench_serve.py --bf16 \
    --batch "$B" --iters 10
done
# B=128 bf16 measured this morning (19.6k img/s) - not repeated.

echo "session done" | tee -a "$OUT/session.log"
