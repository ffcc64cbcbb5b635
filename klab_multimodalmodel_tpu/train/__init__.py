from .feature_cache import FrozenFeatureCache, swin_feature_shape
from .loop import train
from .optim import make_lr_schedule, make_optimizer, trainable_labels
from .trainer import Trainer, TrainState
