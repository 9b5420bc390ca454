"""Image loading/saving for the flow engine.

The reference uses OpenCV ``imread`` + ``convertTo(CV_32F)``
(/root/reference/src/run_dense.cpp:137-145): images are loaded as **BGR**
uint8 and converted to float32 *without scaling* (values in [0, 255]).
We reproduce those numerics (BGR channel order, 0..255 floats) so flow
fields are directly comparable with the reference's outputs.
"""

from __future__ import annotations

import os

import numpy as np


def load_image(path: str | os.PathLike) -> np.ndarray:
    """Load an image as float32 [H, W, 3] in BGR order, values 0..255."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    rgb = np.asarray(img, dtype=np.float32)
    return rgb[..., ::-1].copy()  # RGB -> BGR to match cv::imread


def save_image(path: str | os.PathLike, img: np.ndarray) -> None:
    """Save a float32 BGR [H, W, 3] (0..255) or uint8 image to disk."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 3:
        arr = arr[..., ::-1]  # BGR -> RGB
    Image.fromarray(arr).save(path)
