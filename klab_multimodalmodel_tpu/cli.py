"""Installed console entry point (``klab-train``) — same surface as the
repo-root ``train.py`` (flag-compatible with the reference's
``/root/reference/train.py:108-109``), available after ``pip install``
without a checkout.
"""

from __future__ import annotations

from .config import parse_arguments
from .train import train


def main() -> None:
    train(parse_arguments())


if __name__ == "__main__":
    main()
