#!/bin/bash
# Round-5 flagship E2V recipe (reference train_e2v recipe at data scale;
# BENCH_NOTES.md "Round 4: flagship E2V re-trained"): 1000 synthetic
# sequences, 60 epochs, len_sequence 15, batch 8, lr 1e-4 (0.9^(epoch/10)
# decay in-trainer), num_events 15000, 180x240/64ch/depth5, bf16 device-
# resident data, uniform shapes. L1+(1-SSIM) loss (LPIPS weights are
# unobtainable offline).
set -e
cd "$(dirname "$0")/.."
exec python train_e2v.py \
  --path_to_train_data data/synth_r5_1000 \
  --epochs 60 -s 15 --batch_size 8 --lr 1e-4 \
  --num_events 15000 --model_name flagship_r5 \
  --precision bfloat16 --device_data bf16 --drop_seq_tails "$@"
