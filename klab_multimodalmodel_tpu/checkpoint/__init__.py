from .convert_hf import convert_swinv2, convert_t5_encoder, convert_t5_lm
