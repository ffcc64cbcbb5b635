from .evaluate import coco_references, evaluate_captions, run
from .metrics import bleu, cider_d, ptb_tokenize, simple_tokenize
