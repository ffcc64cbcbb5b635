from .generate import (StreamState, beam_search_decode, generate,
                       greedy_decode, sample_decode, stream_chunk,
                       stream_decode, stream_init, warp_logits)
from .speculative import (speculative_greedy_decode,
                          speculative_greedy_decode_with_stats)
