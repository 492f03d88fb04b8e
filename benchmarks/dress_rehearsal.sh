#!/bin/bash
# Dress rehearsal: synthetic fixtures -> real `fashionern train` -> real
# `fashionern eval`, per dataset, through the actual CLI on the real chip
# (or CPU if no TPU). Proves the end-to-end PLUMBING the reference
# exercises via run/train/train_*.py + run/test/test_*.py; the math is
# proven by tests + benchmarks/learning_demo.py.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash benchmarks/dress_rehearsal.sh [workdir]
set -e
WORK=${1:-/tmp/dress_rehearsal}
CLI="python -m fashionern_aaai2024_tpu.cli.main"
mkdir -p "$WORK"

for DS in fashioniq cirr shoes fashion200k; do
  ROOT="$WORK/$DS"
  echo "=== $DS: fixture ==="
  $CLI make-fixture --dataset $DS --out "$ROOT"
  echo "=== $DS: train (2 steps x 1 epoch, ViT-B-16) ==="
  $CLI train --dataset $DS --data-root "$ROOT" \
    --clip-model-name ViT-B-16 --batch-size 4 --num-epochs 1 \
    --max-steps-per-epoch 2 --validation-frequency 100 --num-workers 0 \
    --bpe-path "$ROOT/bpe.txt.gz" --ckpt-dir "$WORK/ckpt_$DS" \
    --print-frequency 1
  echo "=== $DS: eval ==="
  SPLIT=val
  $CLI eval --dataset $DS --data-root "$ROOT" \
    --clip-model-name ViT-B-16 --batch-size 8 --num-workers 0 \
    --bpe-path "$ROOT/bpe.txt.gz" --split $SPLIT --json
done
echo "ALL FOUR DATASET DRESS REHEARSALS GREEN"
