#!/usr/bin/env bash
# Sparse upcycling (Komatsuzaki et al. 2023): continue pretraining a
# DENSE converted checkpoint as a Mixture-of-Experts transformer.
# --init_checkpoint points at a tools/convert_hf_checkpoint.py output (or
# any dense-layout params checkpoint); with --moe_experts set, the loader
# initializes every expert as an exact copy of the dense MLP and keeps a
# fresh router (checkpoint/io.py:load_pretrained_params ->
# models/t5.py:upcycle_t5_params). Optimizer state starts fresh — the
# paper's procedure. Towers (swin, frozen T5) restore as usual from the
# same checkpoint.
python train.py \
    --num_steps 10000 \
    --save_interval 1000 \
    --accumulation_steps 2 \
    --batch_size 64 \
    --moe_experts 8 \
    --moe_top_k 1 \
    --mesh_shape 4 1 1 1 1 2 \
    --init_checkpoint results/pretrained/ \
    --swin_softmax_dtype bfloat16 \
    --swin_gelu_approximate \
    --frozen_param_dtype bfloat16 \
    --cache_frozen_features \
    --tokenizer_path results/pretrained/spiece.model \
    --data_dir /user/data/redcaps/ \
    --result_dir results/pretrain/upcycle_moe_transformer_tpu/
