from .logger import get_logger
from .metrics import LossCounter, Stopwatch
