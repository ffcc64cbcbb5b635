#!/usr/bin/env bash
# MSCOCO caption fine-tune, frozen towers, transformer-only training.
# Parity: /root/reference/run_scripts/caption/train_only_transformer.sh
# (torchrun -> single per-host process; SPMD over the TPU mesh).
python train.py \
    --num_epochs 50 \
    --save_interval 5 \
    --data_dir /user/data/mscoco2017/ \
    --result_dir results/caption/only_transformer/
