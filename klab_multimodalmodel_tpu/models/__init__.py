from .t5 import (T5Encoder, T5ForConditionalGeneration, cross_entropy_loss,
                 relative_position_bucket, shift_right)
