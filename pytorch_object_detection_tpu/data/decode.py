"""Host image decode: native C++ fast path, PIL fallback.

The reference decodes through PIL one Python call at a time
(`/root/reference/dataset/voc.py:96`, `Test_coco.py:55`).  Here decode is
a native runtime component (native/jpeg_loader.cpp): libjpeg straight
into numpy — and, for the device-resize path, straight into the fixed
uint8 tile the device program consumes, skipping the intermediate
full-image array entirely.  Anything the native decoder declines
(CMYK JPEGs, PNGs, corrupt streams) falls back to PIL, so the loaders
accept everything PIL accepts.  Both paths are bit-exact for baseline
JPEGs (same libjpeg-turbo under the hood; tested in test_native.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def decode_image(path) -> np.ndarray:
    """RGB uint8 [H,W,3] from an image file or raw bytes (native JPEG
    path, PIL fallback)."""
    from pytorch_object_detection_tpu.native import lib as native

    out = native.jpeg_decode_native(path)
    if out is not None:
        return out
    import io

    from PIL import Image

    src = io.BytesIO(path) if isinstance(path, (bytes, bytearray)) else path
    return np.asarray(Image.open(src).convert("RGB"))


def decode_image_to_tile(path, tile_hw: Tuple[int, int]):
    """Decode straight into a fixed uint8 tile (decode_to_tile semantics).

    Returns (tile [th,tw,3] u8, (h, w) content size clipped to the tile).
    """
    from pytorch_object_detection_tpu.native import lib as native

    out = native.jpeg_decode_tile_native(path, tile_hw)
    if out is not None:
        return out
    from pytorch_object_detection_tpu.data.pipeline import decode_to_tile

    return decode_to_tile(decode_image(path), tile_hw)
