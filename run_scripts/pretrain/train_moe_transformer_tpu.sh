#!/usr/bin/env bash
# RedCaps span-corruption pretrain with a Mixture-of-Experts transformer —
# beyond the reference's model zoo (SURVEY.md §2D EP row): scales the
# trainable transformer's parameter count 8x without scaling per-token
# FLOPs. Every MLP becomes a Switch top-1 MoE (ops/moe.py); on a multi-chip
# host the experts shard over the mesh's expert axis (here: 4-way data x
# 2-way expert over 8 chips — adjust to the local topology). This recipe
# trains the MoE from scratch; to warm-start from a converted dense
# checkpoint instead, see upcycle_moe_transformer_tpu.sh (sparse
# upcycling via --init_checkpoint).
python train.py \
    --num_steps 10000 \
    --save_interval 1000 \
    --accumulation_steps 2 \
    --batch_size 64 \
    --moe_experts 8 \
    --moe_top_k 1 \
    --mesh_shape 4 1 1 1 1 2 \
    --swin_softmax_dtype bfloat16 \
    --swin_gelu_approximate \
    --frozen_param_dtype bfloat16 \
    --cache_frozen_features \
    --tokenizer_path results/pretrained/spiece.model \
    --data_dir /user/data/redcaps/ \
    --result_dir results/pretrain/moe_transformer_tpu/
