from .coco import CocoIndex
from .datasets import (COCO_PROMPT, CocoCaptionDataset, DatasetBase,
                       RedCapsDataset, SyntheticCaptionDataset, build_dataset)
from .image_ops import IMAGENET_MEAN, IMAGENET_STD, normalize_images
from .pipeline import Batch, DataLoader, get_dataloader
