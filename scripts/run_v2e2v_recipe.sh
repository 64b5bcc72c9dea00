#!/bin/bash
# Reference-recipe-scale V2E2V training + eval (VERDICT r2 item 3; re-recorded round 4 under the fixed per-sample voxel normalization (VERDICT r3 item 4)).
#
# Trains train.py (video -> events -> video, whole BPTT window per jit step)
# at the reference recipe shape on the 1000-sequence synthetic set, warm-
# started from the round-4 flagship E2V checkpoint (ref train.py:58-61 loads
# pretrained e2v weights only), still_life-style emulator config
# (ref README.md:63-86: C=0.6, pl=1.5/ps=0.5, fc=200, ql=1/qs=0), then runs
# the full V2E2V loop on held-out sequences via test.py.
#
# --device_data bf16: mandatory for long runs on this platform (every H2D
# transfer leaks host RAM; see BENCH_NOTES.md round 2).
set -euo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${EPOCHS:-60}"
TRAIN_LOG="${TRAIN_LOG:-/tmp/v2e2v_recipe_train.log}"
EVAL_LOG="${EVAL_LOG:-/tmp/v2e2v_recipe_eval.log}"
NAME="${NAME:-v2e2v_recipe_r4}"

echo "[recipe] training ${EPOCHS} epochs -> ${TRAIN_LOG}"
timeout "${TRAIN_TIMEOUT:-21600}" python train.py \
  --path_to_train_data data/synth_r4_1000 \
  --path_to_model models --model_name "${NAME}" \
  --path_to_e2v models/flagship_r4_cista-lstc_b5_d5_c64/flagship_r4_cista-lstc_b5_d5_c64_60 \
  --len_sequence 6 --num_pack_frames 10 --batch_size 4 --epochs "${EPOCHS}" \
  --C 0.6 --pl 1.5 --ps 0.5 --cutoff_hz 200 --ql 1 --qs 0 \
  --device_data bf16 --drop_seq_tails > "${TRAIN_LOG}" 2>&1

CKPT="models/${NAME}_C0.6_1.5_0.5_fc200.0_1.0_0.0/${NAME}_C0.6_1.5_0.5_fc200.0_1.0_0.0_${EPOCHS}"
echo "[recipe] eval ${CKPT} -> ${EVAL_LOG}"
timeout 3600 python test.py \
  --path_to_test_data data/synth_r4_test \
  --path_to_test_model "${CKPT}" \
  --reader_type image_reader --num_pack_frames 10 \
  --output_folder results/v2e2v_recipe > "${EVAL_LOG}" 2>&1

echo "[recipe] done; train tail:"
tail -5 "${TRAIN_LOG}"
tail -5 "${EVAL_LOG}"
