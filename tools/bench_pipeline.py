#!/usr/bin/env python
"""Host input-pipeline throughput: can the loader outrun the TPU step?

Creates a COCO-like directory of real JPEGs, then measures end-to-end
DataLoader throughput (decode -> resize -> tokenize -> batch) and compares
with the device step rate from bench.py. "Zero host-side preprocessing
stalls" (BASELINE.json) holds when pipeline img/s >= device img/s.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(root: str, n: int = 512, size=(640, 480)) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    base = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
    for i in range(n):
        # vary content slightly so decode cost is realistic
        arr = np.roll(base, i * 7, axis=1)
        Image.fromarray(arr).save(os.path.join(root, f"{i:06d}.jpg"),
                                  quality=90)


class JpegDataset:
    image_size = 256

    def __init__(self, root: str):
        from klab_multimodalmodel_tpu.data.datasets import load_image_resized

        self._load = load_image_resized
        self.files = sorted(
            os.path.join(root, f) for f in os.listdir(root))

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        img = self._load(self.files[i], self.image_size)
        return img, "What does th image describe ?", f"a caption {i}"


def main() -> None:
    from klab_multimodalmodel_tpu import native
    from klab_multimodalmodel_tpu.data import DataLoader
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    n = int(os.environ.get("KLAB_PIPE_N", "512"))
    with tempfile.TemporaryDirectory() as root:
        make_jpegs(root, n)
        ds = JpegDataset(root)
        loader = DataLoader(ds, ByteTokenizer(), global_batch_size=32,
                            max_source_length=64, max_target_length=32,
                            seed=0, prefetch=4)
        # warm one epoch (page cache), then measure
        for _ in loader:
            pass
        t0 = time.perf_counter()
        count = 0
        for batch in loader:
            count += batch["images"].shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "host pipeline throughput (jpeg decode+resize+tokenize)",
            "value": round(count / dt, 1),
            "unit": "images/sec",
            "native_runtime": native.available(),
            "workers": loader.num_workers,
        }))


if __name__ == "__main__":
    main()
