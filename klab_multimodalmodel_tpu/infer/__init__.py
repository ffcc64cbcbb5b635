from .generate import (beam_search_decode, generate, greedy_decode,
                       sample_decode, warp_logits)
