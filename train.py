#!/usr/bin/env python
"""Training entry point — flag-compatible with the reference's ``train.py``
(``/root/reference/train.py:108-109``). No torchrun: on TPU the process is
launched once per host and ``jax.distributed`` handles rendezvous.

    python train.py --num_epochs 50 --save_interval 5 \
        --data_dir /data/mscoco2017/ --result_dir results/caption/
"""

from klab_multimodalmodel_tpu.config import parse_arguments
from klab_multimodalmodel_tpu.train import train


def main() -> None:
    config = parse_arguments()
    train(config)


if __name__ == "__main__":
    main()
