#!/usr/bin/env bash
# RedCaps span-corruption pretrain, frozen towers — TPU-optimized variant of
# run_scripts/pretrain/train_only_transformer.sh (same semantics on the
# trainable transformer; flags are the measured BASELINE.md levers).
# Note: span corruption re-masks the source text every epoch, so only the
# IMAGE features are cacheable — the loop detects this automatically
# (dataset.source_is_static=False) and keeps the frozen text encoder live.
python train.py \
    --num_steps 10000 \
    --save_interval 1000 \
    --accumulation_steps 2 \
    --batch_size 64 \
    --swin_softmax_dtype bfloat16 \
    --swin_gelu_approximate \
    --frozen_param_dtype bfloat16 \
    --cache_frozen_features \
    --bucket_lengths \
    --init_checkpoint results/pretrained/ \
    --tokenizer_path results/pretrained/spiece.model \
    --data_dir /user/data/redcaps/ \
    --result_dir results/pretrain/only_transformer_tpu_fast/
