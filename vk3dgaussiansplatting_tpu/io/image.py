"""Frame output — the swapchain/present equivalent.

The reference presents RGBA8 swapchain images (Swapchain.cpp:20-48); headless
TPU rendering writes frames to PNG (or raw arrays) instead.
"""

from __future__ import annotations

import numpy as np


def write_png(path, image_u8: np.ndarray) -> None:
    """Write an [H,W,3|4] uint8 image to PNG."""
    from PIL import Image

    arr = np.asarray(image_u8)
    if arr.dtype != np.uint8:
        raise TypeError("expected uint8 image")
    mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
    Image.fromarray(arr, mode=mode).save(path)


def read_png(path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))
