#!/usr/bin/env bash
# Experiment launcher — the TPU-native analog of the reference's SLURM script
# (/root/reference/run_nfp_experiments_new.slurm): one accelerator, the
# gap_only ResNet18 EuroSAT baseline plus the NFP variant.
#
# Usage: scripts/run_nfp_experiments.sh [DATA_DIR]
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_DIR="${1:-data/EuroSAT}"

python demo.py \
    --name eurosat_gap \
    --dataset EuroSAT \
    --data_dir "$DATA_DIR" \
    --model_type resnet18 \
    --model_variant gap_only \
    --batch_size 32 \
    --resize_size 64 \
    --input_size 64 \
    --learning_rate 1e-4 \
    --max_epochs 200 \
    --patience 10

python demo.py \
    --name eurosat_nfp \
    --dataset EuroSAT \
    --data_dir "$DATA_DIR" \
    --model_type resnet18 \
    --model_variant texture_nfp \
    --similarity cosine \
    --batch_size 32 \
    --resize_size 64 \
    --input_size 64 \
    --learning_rate 1e-4 \
    --max_epochs 200 \
    --patience 10
