#!/usr/bin/env bash
# RedCaps span-corruption pretraining, frozen towers.
# Parity: /root/reference/run_scripts/pretrain/train_only_transformer.sh.
python train.py \
    --accumulation_steps 2 \
    --num_steps 10000 \
    --data_dir /data/dataset/redcaps/ \
    --result_dir results/pretrain/only_transformer/
