#!/bin/bash
# Minimal end-to-end smoke on CPU: synth data -> train E2V -> eval -> V2E2V
# train -> V2E2V test. ~3 min. Usage: bash scripts/smoke.sh [workdir]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$(mktemp -d)}"
export V2E2V_PLATFORM=cpu
cd "$REPO"

python scripts/make_synth_data.py --out_dir "$WORK/data" --num_sequences 2 \
    --num_frames 24 --image_dim 32 40 --num_pack_frames 6
python train_e2v.py --path_to_train_data "$WORK/data" --image_dim 32 40 \
    --base_channels 8 --depth 2 --num_events 300 --len_sequence 3 --epochs 1 \
    --path_to_model "$WORK/models" --model_name smoke
python test_e2v.py --path_to_test_data "$WORK/data" \
    --path_to_test_model "$WORK/models/smoke_cista-lstc_b5_d2_c8/smoke_cista-lstc_b5_d2_c8_1" \
    --image_dim 32 40 --base_channels 8 --depth 2 --num_events 300 \
    --test_data_mode real --test_img_num 12 -o "$WORK/eval"
python train.py --path_to_train_data "$WORK/data" --image_dim 32 40 \
    --base_channels 8 --depth 2 --len_sequence 2 --num_pack_frames 6 --epochs 1 \
    --path_to_model "$WORK/models" --model_name smokev --C 0.4
python test.py --path_to_test_data "$WORK/data" \
    --path_to_test_model "$WORK/models/smokev_C0.4_1.5_0.5_fc0_1_1/smokev_C0.4_1.5_0.5_fc0_1_1_1" \
    --image_dim 32 40 --base_channels 8 --depth 2 --num_pack_frames 6 \
    --reader_type image_reader --test_img_num 18 -o "$WORK/v2e2v_out" 2>/dev/null || \
python test.py --path_to_test_data "$WORK/data" \
    --path_to_test_model "$(ls -d "$WORK"/models/smokev_*/* | head -1)" \
    --image_dim 32 40 --base_channels 8 --depth 2 --num_pack_frames 6 \
    --reader_type image_reader --test_img_num 18 -o "$WORK/v2e2v_out"
echo "SMOKE OK: $WORK"
