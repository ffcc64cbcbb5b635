"""KLab MultiModalModel — TPU-native (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capability surface of
Da-Tsuchi/KLab_MultiModalModel (SwinV2 vision encoder + frozen T5 text
encoder -> sequence-concat soft prompt -> T5 encoder-decoder) designed for
TPU: SPMD sharding over a device mesh, scan-compiled transformer stacks,
Pallas kernels on the hot attention paths, and a host input pipeline that
keeps the training step pure and jit-compiled.
"""

__version__ = "0.1.0"

from .config import Config, parse_arguments  # noqa: F401
