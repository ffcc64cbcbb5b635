#!/usr/bin/env bash
# RedCaps span-corruption pretraining with a trainable SwinV2 tower.
# Parity: /root/reference/run_scripts/pretrain/train_with_swin.sh (see
# train_with_swin.sh note on quirk #1).
python train.py \
    --image_model_train \
    --accumulation_steps 2 \
    --num_steps 10000 \
    --data_dir /data/dataset/redcaps/ \
    --result_dir results/pretrain/with_swin/
