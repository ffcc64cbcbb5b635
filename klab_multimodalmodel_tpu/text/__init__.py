from .span_corruption import span_corrupt
from .tokenizer import (ByteTokenizer, TokenizerBase, UnigramTokenizer,
                        load_tokenizer, train_unigram_tokenizer)
