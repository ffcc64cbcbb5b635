#!/usr/bin/env bash
# MSCOCO caption fine-tune with a trainable SwinV2 tower.
# Parity: /root/reference/run_scripts/caption/train_with_swin.sh.
# NOTE: unlike the reference (quirk #1 — Swin got gradients but never
# updates), the trainable tower actually joins the optimizer here. Add
# --freeze_image_model_updates for bit-parity with the reference.
python train.py \
    --image_model_train \
    --num_epochs 50 \
    --save_interval 5 \
    --data_dir /user/data/mscoco2017/ \
    --result_dir results/caption/with_swin/
