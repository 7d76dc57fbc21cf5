"""Image I/O helpers (PIL-based; the reference uses scikit-image).

Mirrors the reference's input handling (main.py:80-84): float32 in [0, 1],
RGBA collapsed to RGB.
"""

from __future__ import annotations

import numpy as np

__all__ = ["imread_float", "imsave_uint8"]


def imread_float(path: str) -> np.ndarray:
    """Load an image as float32 (H, W) or (H, W, 3) in [0, 1]."""
    from PIL import Image

    img = np.asarray(Image.open(path))
    if np.issubdtype(img.dtype, np.integer):
        img = img.astype(np.float32) / float(np.iinfo(img.dtype).max)
    else:
        img = img.astype(np.float32)
    if img.ndim == 3 and img.shape[-1] == 4:
        img = img[..., :3]  # drop alpha (reference: color.rgba2rgb)
    return img


def imsave_uint8(path: str, img: np.ndarray) -> None:
    from PIL import Image

    arr = (255.0 * np.clip(img, 0.0, 1.0) + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)
