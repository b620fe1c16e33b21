"""Input-pipeline throughput benchmark (VERDICT r2 #3).

Measures the real loader -> device rate that bench.py's device-resident
synthetic images sidestep: JPEG decode on the host (native libjpeg via native/jpeg_loader.cpp,
PIL fallback), then either

  * ``host``   — cv2 aspect-preserving resize on the host (the reference's
    path, dataset/voc.py:110-139) and H2D of the canvas; or
  * ``device`` — host places the decoded image in a fixed uint8 tile
    (decode_to_tile) and the batched resize runs ON DEVICE
    (data/pipeline.make_device_resize: scale_and_translate -> two MXU
    matmuls), fulfilling the north-star decode->resize->flip->normalize
    device pipeline.

A synthetic JPEG corpus at VOC-ish sizes is generated under /tmp.  Prints
one JSON line per mode; the device path is also run through the fused
normalize preprocess so the measured unit is "model-ready images/sec".

Usage: python scripts/bench_input.py [n_images] [batch]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(root: str, n: int) -> list:
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    sizes = [(375, 500), (500, 375), (333, 500), (500, 500), (480, 360)]
    paths = []
    for i in range(n):
        p = os.path.join(root, f"img_{i:04d}.jpg")
        if not os.path.exists(p):
            h, w = sizes[i % len(sizes)]
            # low-frequency content so JPEG decode cost is realistic
            base = rng.integers(0, 256, (h // 8, w // 8, 3)).astype(np.uint8)
            img = np.asarray(Image.fromarray(base).resize((w, h)))
            Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


class JpegDataset:
    """Decode-only dataset; `mode` picks where the resize happens."""

    def __init__(self, paths, canvas_hw, tile_hw, mode: str):
        from pytorch_object_detection_tpu.data.voc import Sample

        self.paths = paths
        self.canvas_hw = canvas_hw
        self.tile_hw = tile_hw
        self.mode = mode
        self._sample = Sample

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from pytorch_object_detection_tpu.data.decode import (
            decode_image,
            decode_image_to_tile,
        )
        from pytorch_object_detection_tpu.data.voc import resize_to_canvas

        if self.mode == "host":
            img = decode_image(self.paths[i])
            canvas, _, scale, chw = resize_to_canvas(img, None, self.canvas_hw)
            return self._sample(canvas, np.zeros((0, 4), np.float32),
                                np.zeros((0,), np.int32), scale, str(i), chw)
        tile, hw = decode_image_to_tile(self.paths[i], self.tile_hw)
        return self._sample(tile, np.zeros((0, 4), np.float32),
                            np.zeros((0,), np.int32), 1.0, str(i), hw)


def run_mode(mode: str, paths, batch, canvas, tile_hw) -> float:
    import jax
    import jax.numpy as jnp

    from pytorch_object_detection_tpu.data.pipeline import (
        DetectionLoader,
        IMAGENET_MEAN,
        IMAGENET_STD,
        make_device_resize,
    )

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    resize = make_device_resize(canvas)

    @jax.jit
    def finish_host(img_u8):  # host already resized: normalize only
        x = img_u8.astype(jnp.float32) / 255.0
        return ((x - mean) / std).sum()

    @jax.jit
    def finish_device(tiles_u8, src_hw):
        canvas_u8, scale, _ = resize(tiles_u8, src_hw)
        x = canvas_u8.astype(jnp.float32) / 255.0
        return ((x - mean) / std).sum() + scale.sum()

    ds = JpegDataset(paths, canvas, tile_hw, mode)
    loader = DetectionLoader(ds, batch_size=batch, shuffle=False, drop_last=True,
                             num_workers=8)

    def submit(b):
        if mode == "host":
            return finish_host(jnp.asarray(b.images))
        hw = np.stack([b.content_h, b.content_w], axis=1)
        return finish_device(jnp.asarray(b.images), jnp.asarray(hw, np.int32))

    # warm-up epoch compiles + fills page cache
    for b in loader:
        float(submit(b))
        break

    n = 0
    t0 = time.perf_counter()
    chk = None
    for b in loader:
        new = submit(b)
        if chk is not None:
            float(chk)  # overlap: wait for batch i-1 while i runs
        chk = new
        n += b.images.shape[0]
    float(chk)
    dt = time.perf_counter() - t0
    return n / dt


def run_host_only(paths, batch, canvas, tile_hw) -> float:
    """Loader iteration rate with no device in the loop: the host decode->
    tile capability (native libjpeg straight into the device tile).  On
    this box the device submit is tunnel-H2D-bound, so this is the number
    that predicts a production host's feed rate per core."""
    from pytorch_object_detection_tpu.data.pipeline import DetectionLoader

    ds = JpegDataset(paths, canvas, tile_hw, "device")
    loader = DetectionLoader(ds, batch_size=batch, shuffle=False, drop_last=True,
                             num_workers=2, process_count=1, process_index=0)
    for _ in loader:  # warm: page cache + thread pool
        break
    n = 0
    t0 = time.perf_counter()
    for b in loader:
        n += b.images.shape[0]
    return n / (time.perf_counter() - t0)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    canvas, tile_hw = (512, 512), (512, 512)
    paths = make_corpus("/tmp/podt_jpeg_corpus", n_images)
    rate = run_host_only(paths, batch, canvas, tile_hw)
    print(json.dumps({
        "metric": "input_pipeline_images_per_sec_host_only",
        "value": round(rate, 2),
        "unit": "images/sec",
    }))
    for mode in ("host", "device"):
        rate = run_mode(mode, paths, batch, canvas, tile_hw)
        print(json.dumps({
            "metric": f"input_pipeline_images_per_sec_{mode}_resize",
            "value": round(rate, 2),
            "unit": "images/sec",
        }))


if __name__ == "__main__":
    main()
