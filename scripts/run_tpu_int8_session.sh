#!/bin/bash
# Serialized TPU measurement session for the int8 MXU work (round 3).
# One process at a time, few compiles each (relay rules — CLAUDE.md).
# Usage: bash scripts/run_tpu_int8_session.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/int8_session}
mkdir -p "$OUT"

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/session.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))" \
    | tee -a "$OUT/session.log"
}

# 0. health + verify drive: NFP kernel vs oracle on hardware, tiny shape
run verify_nfp python - << 'EOF'
import time; t0 = time.time()
import jax, jax.numpy as jnp
import numpy as np
from neighbour_feature_pooling_tpu.ops import nfp, nfp_reference
from neighbour_feature_pooling_tpu.utils import enable_compilation_cache
enable_compilation_cache()
print("backend", jax.default_backend(), round(time.time() - t0, 1), "s")
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (2, 28, 28, 64)), jnp.float32)
out = nfp(x, 1, "cosine", padding=1)
ref = nfp_reference(x, 1, "cosine", padding=1)
print("nfp max|d|", float(jnp.max(jnp.abs(out - ref))))
EOF

# 1. int8 GEMM: default tiles + baselines at 4096^3
run gemm_default python scripts/bench_int8_gemm.py --iters 20

# 2. int8 GEMM tile sweep (12 configs, one compile each — biggest step)
run gemm_sweep python scripts/bench_int8_gemm.py --iters 10 --sweep \
  --out bench_int8_gemm_sweep.jsonl

# 3. int8 conv at the two big ResNet shapes + baselines
run conv_big python scripts/bench_int8_conv.py --batch 128 \
  --shapes rn_56x64,rn_28x128 --iters 10

# 4. int8 conv small-map shapes
run conv_small python scripts/bench_int8_conv.py --batch 128 \
  --shapes rn_14x256,rn_7x512 --iters 10

# 5. end-to-end serving: int8 (now MXU-routed) vs bf16, three families
run serve_int8 python scripts/bench_serve.py --int8 --batch 128 --iters 10
run serve_int8_calib python scripts/bench_serve.py --int8 --calibrate \
  --batch 128 --iters 10
run serve_bf16 python scripts/bench_serve.py --bf16 --batch 128 --iters 10
run serve_rn50_int8 python scripts/bench_serve.py --model_type resnet50 \
  --int8 --batch 128 --iters 10
run serve_rn50_bf16 python scripts/bench_serve.py --model_type resnet50 \
  --bf16 --batch 128 --iters 10
run serve_vit_int8 python scripts/bench_serve.py --model_type vittiny \
  --int8 --batch 128 --iters 10
run serve_vit_bf16 python scripts/bench_serve.py --model_type vittiny \
  --bf16 --batch 128 --iters 10

echo "session done" | tee -a "$OUT/session.log"
