"""Optional TensorBoard scalar logging.

The reference's observability is a text log + a matplotlib loss curve
(``/root/reference/modules/losses.py:19-31``); SURVEY.md §5 calls for an
optional TensorBoard sink on top. Uses ``torch.utils.tensorboard``, which
is NOT a base dependency — install the ``tb`` extra
(``pip install klab-multimodalmodel-tpu[tb]``) to use ``--tensorboard``;
the import is lazy so training without the flag never requires it.
"""

from __future__ import annotations

from typing import Optional


class ScalarWriter:
    """No-op unless enabled; rank-0 only (mirror of the file logger)."""

    def __init__(self, log_dir: Optional[str]):
        self._w = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
            except ImportError as e:
                raise ImportError(
                    "--tensorboard needs torch + tensorboard on the host: "
                    "pip install 'klab-multimodalmodel-tpu[tb]' (or drop "
                    "the flag; train.log + loss.png need no extras)") from e

            self._w = SummaryWriter(log_dir=log_dir)

    @property
    def enabled(self) -> bool:
        return self._w is not None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._w is not None:
            self._w.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        if self._w is not None:
            self._w.flush()
            self._w.close()
