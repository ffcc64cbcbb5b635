#!/usr/bin/env bash
# MSCOCO caption fine-tune, frozen towers — TPU-optimized variant of
# run_scripts/caption/train_only_transformer.sh. Same training semantics
# where it matters (exact Adam on the trainable transformer, same LR
# schedule/step counts, bit-identical cached losses); the flags below are
# the measured perf levers from BASELINE.md:
#   * frozen-tower opt mode (bf16 softmax/GELU/storage on the FROZEN
#     towers only; ~1% feature deviation, the trainable path is exact);
#   * frozen-feature cache (epoch 1 computes tower features once, later
#     epochs skip the frozen forwards — bit-identical losses);
#   * pretrained init from a converted HF checkpoint (see
#     tools/convert_hf_checkpoint.py and MIGRATION.md).
# Measured v5e: 942 img/s/chip steady state vs 486 recompute (3.9x the
# estimated A100 reference baseline).
python train.py \
    --num_epochs 50 \
    --save_interval 5 \
    --batch_size 64 \
    --swin_softmax_dtype bfloat16 \
    --swin_gelu_approximate \
    --frozen_param_dtype bfloat16 \
    --cache_frozen_features \
    --bucket_lengths \
    --init_checkpoint results/pretrained/ \
    --tokenizer_path results/pretrained/tokenizer.json \
    --data_dir /user/data/mscoco2017/ \
    --result_dir results/caption/only_transformer_tpu_fast/
