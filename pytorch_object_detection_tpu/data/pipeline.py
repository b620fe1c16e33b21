"""Batched input pipeline: threaded host loader + fused device preprocessing.

Replaces the reference's torch DataLoader + collate_fn + in-collate
normalization (`/root/reference/dataset/voc.py:141-173`,
`train_new.py:93-132`) with:

  * a thread-pool prefetching loader producing statically-shaped uint8
    batches (small H2D transfers — normalization happens on device);
  * per-process index sharding via `jax.process_index()` (the TPU-native
    DistributedSampler);
  * one jitted device program fusing uint8->float, random horizontal flip
    (images AND boxes, content-width aware), color jitter (brightness/
    contrast/saturation/hue, p=0.3, strength 0.1 — reference
    data/augment.py:13-24) and ImageNet normalization — keyed by explicit
    PRNG (fixes the reference's broken per-worker seeding,
    train.py:85 `worker_init_fn=np.random.seed(0)`).
"""
from __future__ import annotations

import queue
import threading
import os
from typing import Iterator, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Batch(NamedTuple):
    """One statically-shaped host batch.

    Iterating a Batch unpacks like the plain 5-tuple the train loop uses;
    ``image_ids`` carries dataset identity for evaluators (order-independent,
    so multi-host sharded eval attributes detections correctly).
    """

    images: np.ndarray  # uint8 [B, H, W, 3]
    boxes: np.ndarray  # f32 [B, M, 4], -1 padded
    labels: np.ndarray  # i32 [B, M], -1 padded
    scales: np.ndarray  # f32 [B]
    content_w: np.ndarray  # i32 [B]
    image_ids: List[str]
    n_valid: int = -1  # real samples in the batch (-1 = all; see pad_last)
    content_h: Optional[np.ndarray] = None  # i32 [B] (device-resize path)


# ---------------------------------------------------------------------------
# device-side fused preprocessing
# ---------------------------------------------------------------------------
def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    rc = (maxc - r) / jnp.maximum(delta, 1e-8)
    gc = (maxc - g) / jnp.maximum(delta, 1e-8)
    bc = (maxc - b) / jnp.maximum(delta, 1e-8)
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(rng, images, prob=0.3, strength=0.1):
    """Batched brightness/contrast/saturation/hue jitter (torchvision
    semantics, fixed b→c→s→h order; the reference shuffles the order)."""
    b, h, w, _ = images.shape
    keys = jax.random.split(rng, 5)
    apply = jax.random.uniform(keys[0], (b, 1, 1, 1)) < prob

    def factor(key):
        return jax.random.uniform(key, (b, 1, 1, 1), minval=1.0 - strength, maxval=1.0 + strength)

    out = images * factor(keys[1])  # brightness
    gray = jnp.mean(out, axis=-1, keepdims=True)
    out = (out - gray.mean(axis=(1, 2), keepdims=True)) * factor(keys[2]) + gray.mean(
        axis=(1, 2), keepdims=True
    )  # contrast
    out = (out - gray) * factor(keys[3]) + gray  # saturation
    hue_shift = jax.random.uniform(keys[4], (b, 1, 1), minval=-strength, maxval=strength)
    hsv = _rgb_to_hsv(jnp.clip(out, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hue_shift) % 1.0)
    out = _hsv_to_rgb(hsv)
    return jnp.where(apply, jnp.clip(out, 0.0, 1.0), images)


def hflip(rng, images, boxes, content_w, prob=0.5):
    """Random horizontal flip about each image's content width.

    Content sits at the canvas's left edge (data/voc.py resize), so flipping
    about ``content_w`` keeps it left-aligned and the padding untouched
    (reference flips pre-resize, dataset/voc.py:12-20 — same geometry).
    """
    b, _, w, _ = images.shape
    flip = jax.random.uniform(rng, (b,)) < prob
    cols = jnp.arange(w)[None, :]  # [1, W]
    nw = content_w[:, None]  # [B, 1]
    src = jnp.where(cols < nw, nw - 1 - cols, cols)  # mirror inside content
    src = jnp.where(flip[:, None], src, cols)  # [B, W]
    flipped = jnp.take_along_axis(images, src[:, None, :, None], axis=2)

    valid = boxes[..., 0] > -0.5
    nw_b = content_w[:, None].astype(boxes.dtype)
    x1 = nw_b - 1.0 - boxes[..., 2]
    x2 = nw_b - 1.0 - boxes[..., 0]
    fb = jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
    new_boxes = jnp.where((flip[:, None] & valid)[..., None], fb, boxes)
    return flipped, new_boxes


def make_device_preprocess(
    train: bool,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    flip_prob: float = 0.5,
    jitter_prob: float = 0.3,
):
    """One jitted program: uint8 -> float -> (flip+jitter) -> normalize."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def fn(rng, images_u8, boxes, content_w):
        x = images_u8.astype(jnp.float32) / 255.0
        if train:
            k1, k2 = jax.random.split(rng)
            x, boxes = hflip(k1, x, boxes, content_w, flip_prob)
            x = color_jitter(k2, x, jitter_prob)
        x = (x - mean) / std
        return x, boxes

    return jax.jit(fn)


def make_device_resize(canvas_hw: Tuple[int, int]):
    """Batched ON-DEVICE aspect-preserving resize onto the fixed canvas.

    Completes the north-star device pipeline (decode -> resize -> flip ->
    normalize on device): the host only JPEG-decodes into a fixed uint8
    tile (image at top-left, last row/col REPLICATED once past the content
    so linear sampling beyond the edge matches cv2's clamp — see
    VOCDataset(raw_tiles=True)), and this program does the per-image
    dynamic-scale resize the host cv2 call used to do
    (reference dataset/voc.py:110-139; host version resize_to_canvas).

    Shapes are static (tile in, canvas out); the per-image scale is DATA
    (jax.image.scale_and_translate), so one compiled program serves every
    image size.  On TPU the separable linear resample lowers to two
    batched matmuls (MXU), not gathers.

    Returns jitted ``fn(tiles_u8 [B,TH,TW,3], src_hw [B,2] i32) ->
    (canvas_u8 [B,ch,cw,3], scale [B] f32, content_hw [B,2] i32)``.
    """
    ch, cw = canvas_hw

    def one(img_u8, hw):
        h = hw[0].astype(jnp.float32)
        w = hw[1].astype(jnp.float32)
        scale = jnp.minimum(ch / h, cw / w)
        nh = jnp.round(h * scale)
        nw = jnp.round(w * scale)
        sy, sx = nh / h, nw / w  # cv2 uses the post-rounding factors
        # scale_and_translate samples input coord (o + 0.5 - t)/s - 0.5:
        # t = 0 IS the cv2 half-pixel-centers mapping
        out = jax.image.scale_and_translate(
            img_u8.astype(jnp.float32), (ch, cw, 3), (0, 1),
            jnp.stack([sy, sx]), jnp.zeros(2),
            method="linear", antialias=False,
        )
        rows = jnp.arange(ch)[:, None, None]
        cols = jnp.arange(cw)[None, :, None]
        out = jnp.where((rows < nh) & (cols < nw), out, 0.0)
        out_u8 = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
        return out_u8, scale, jnp.stack([nh, nw]).astype(jnp.int32)

    return jax.jit(jax.vmap(one))


def decode_to_tile(image: np.ndarray, tile_hw: Tuple[int, int]) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Place a decoded image into a fixed uint8 tile (top-left), replicating
    the last content row/col once so device-side linear resampling past the
    edge sees cv2's clamp semantics.  Images larger than the tile are
    center-cropped to it (rare; tile should bound the dataset)."""
    th, tw = tile_hw
    h, w = image.shape[:2]
    if h > th or w > tw:
        image = image[:th, :tw]
        h, w = image.shape[:2]
    tile = np.zeros((th, tw, 3), np.uint8)
    tile[:h, :w] = image
    if h < th:
        tile[h, :w] = image[h - 1, :w]
    if w < tw:
        tile[: min(h + 1, th), w] = tile[: min(h + 1, th), w - 1]
    return tile, (h, w)


# ---------------------------------------------------------------------------
# host-side loader
# ---------------------------------------------------------------------------
class DetectionLoader:
    """Thread-pool prefetching loader over a map-style dataset.

    Yields statically-shaped numpy batches:
      images uint8 [B,H,W,3], boxes f32 [B,M,4] (-1 padded),
      labels i32 [B,M] (-1 padded), scales f32 [B], content_w i32 [B].
    The index list is sharded across JAX processes (multi-host DP) and the
    per-epoch shuffle is seeded (deterministic, unlike the reference's
    unseeded workers).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_boxes: int = 64,
        shuffle: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 4,
        pad_last: bool = False,
        process_count: Optional[int] = None,
        process_index: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.pad_last = pad_last  # pad final batch to batch_size (one XLA
        # program for every batch; padding excluded via Batch.n_valid)
        self.process_count = process_count  # None -> jax.process_count()
        self.process_index = process_index
        self.epoch = 0

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self.epoch).permutation(n)
        # shard across processes (TPU-native DistributedSampler); strided so
        # no sample is ever dropped (counts differ by at most 1 per process)
        pc = self.process_count if self.process_count is not None else jax.process_count()
        pi = self.process_index if self.process_index is not None else jax.process_index()
        if pc > 1:
            idx = idx[pi::pc]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_from_samples(self, samples) -> "Batch":
        n_real = len(samples)
        if self.pad_last and n_real < self.batch_size:
            samples = list(samples) + [samples[-1]] * (self.batch_size - n_real)
        b = len(samples)
        h, w = samples[0].image.shape[:2]
        images = np.zeros((b, h, w, 3), np.uint8)
        boxes = np.full((b, self.max_boxes, 4), -1.0, np.float32)
        labels = np.full((b, self.max_boxes), -1, np.int32)
        scales = np.zeros((b,), np.float32)
        content_w = np.zeros((b,), np.int32)
        content_h = np.zeros((b,), np.int32)
        ids = []
        for i, s in enumerate(samples):
            images[i] = s.image
            n = min(len(s.boxes), self.max_boxes)
            if n:
                boxes[i, :n] = s.boxes[:n]
                labels[i, :n] = s.labels[:n]
            scales[i] = s.scale
            content_w[i] = s.content_hw[1] or w
            content_h[i] = s.content_hw[0] or h
            ids.append(s.image_id)
        return Batch(images, boxes, labels, scales, content_w, ids, n_real,
                     content_h)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        from concurrent.futures import ThreadPoolExecutor

        indices = self._indices()
        self.epoch += 1
        n_batches = len(self) if not self.drop_last else len(indices) // self.batch_size

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            stop = threading.Event()

            def producer():
                for bi in range(n_batches):
                    if stop.is_set():
                        return
                    chunk = indices[bi * self.batch_size : (bi + 1) * self.batch_size]
                    samples = list(pool.map(lambda i: self.dataset[int(i)], chunk))
                    out_q.put(self._batch_from_samples(samples))
                out_q.put(None)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            try:
                while True:
                    item = out_q.get()
                    if item is None:
                        return
                    yield item
            finally:
                stop.set()


class RingTileLoader:
    """Batched-native loader: ONE Python call per batch, preallocated ring.

    DetectionLoader pays ~3 ms of serial Python per image (a __getitem__
    call, a Sample object, per-field copies in _batch_from_samples) — a
    ~310 img/s ceiling on one core no matter how many decode threads run
    (PERF.md r3/r4).  This loader removes the per-image Python entirely:

      * annotations are parsed ONCE at init into dense [N, M, 4]/[N, M]
        arrays; per batch they are fancy-indexed and scaled vectorized;
      * raw JPEG bytes are cached in host RAM at init (a VOC-sized corpus
        is ~2 GB); the per-image work in the hot loop is one list index;
      * each batch is decoded by a single ctypes call into the C++ libjpeg
        thread pool (GIL released) writing straight into one of ``depth``
        PREALLOCATED [B, th, tw, 3] ring slots — no allocation, no
        first-touch page faults, no per-image numpy copies;
      * box scaling to canvas coordinates runs on the whole batch array.

    Yields the same raw-tile Batch contract as
    ``DetectionLoader(dataset(raw_tiles=True))``: device-side
    aspect-preserving resize consumes (tiles, content_hw); a yielded Batch's
    ``images`` is a VIEW of a ring slot, valid until ``depth - 1`` further
    batches have been drawn (the consumer hands the oldest slot back to the
    producer) — transfer it (jnp.asarray / device_put) before then.

    Serial-overhead measurement: ``skip_decode=True`` replaces the decode
    call with nothing (tiles keep stale bytes), so the loop's rate IS the
    non-decode ceiling (scripts/bench_loader.py; PERF.md r5 "loader
    ceiling").

    Supports VOC-style datasets (``.items`` of (root, image_id)); augment
    must be None — training augmentation runs on device
    (make_device_preprocess), exactly so the host loader can stay batched.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_boxes: int = 64,
        shuffle: bool = True,
        seed: int = 0,
        decode_threads: int = 0,
        depth: int = 3,
        drop_last: bool = True,
        pad_last: bool = False,
        process_count: Optional[int] = None,
        process_index: Optional[int] = None,
        skip_decode: bool = False,
    ):
        from pytorch_object_detection_tpu.data.voc import parse_voc_xml

        assert getattr(dataset, "augment", None) is None, (
            "RingTileLoader is the batched host path; use device-side "
            "augmentation (make_device_preprocess)")
        assert depth >= 2
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.shuffle = shuffle
        self.seed = seed
        self.decode_threads = decode_threads
        self.depth = depth
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.process_count = process_count
        self.process_index = process_index
        self.skip_decode = skip_decode
        self.epoch = 0
        self.canvas_hw = dataset.canvas_hw
        self.tile_hw = getattr(dataset, "tile_hw", dataset.canvas_hw)

        n = len(dataset.items)
        self._ids = [img_id for _root, img_id in dataset.items]
        self._blobs: List[bytes] = []
        self.boxes_all = np.full((n, max_boxes, 4), -1.0, np.float32)
        self.labels_all = np.full((n, max_boxes), -1, np.int32)
        for i, (root, img_id) in enumerate(dataset.items):
            with open(os.path.join(root, "JPEGImages", f"{img_id}.jpg"), "rb") as f:
                self._blobs.append(f.read())
            bx, lb = parse_voc_xml(
                os.path.join(root, "Annotations", f"{img_id}.xml"),
                getattr(dataset, "use_difficult", False),
            )
            k = min(len(bx), max_boxes)
            if k:
                self.boxes_all[i, :k] = bx[:k]
                self.labels_all[i, :k] = lb[:k]

        th, tw = self.tile_hw
        self._ring_tiles = np.zeros((depth, batch_size, th, tw, 3), np.uint8)
        self._ring_hw = np.zeros((depth, batch_size, 2), np.int32)

    def _indices(self) -> np.ndarray:
        n = len(self._blobs)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self.epoch).permutation(n)
        pc = self.process_count if self.process_count is not None else jax.process_count()
        pi = self.process_index if self.process_index is not None else jax.process_index()
        if pc > 1:
            idx = idx[pi::pc]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _produce(self, chunk: np.ndarray, slot: int) -> Batch:
        from pytorch_object_detection_tpu.native.lib import jpeg_decode_batch_native

        n_real = len(chunk)
        if self.pad_last and n_real < self.batch_size:
            chunk = np.concatenate(
                [chunk, np.full(self.batch_size - n_real, chunk[-1], chunk.dtype)])
        b = len(chunk)
        tiles = self._ring_tiles[slot, :b]
        hw = self._ring_hw[slot, :b]
        blobs = [self._blobs[i] for i in chunk]  # the only per-image Python
        if not self.skip_decode:
            out = jpeg_decode_batch_native(
                blobs, self.tile_hw, self.decode_threads,
                out_tiles=tiles, out_hw=hw)
            if out is None:  # no native lib: whole-batch PIL fallback
                from pytorch_object_detection_tpu.data.decode import decode_image

                for j, blob in enumerate(blobs):
                    tiles[j], (h, w) = decode_to_tile(
                        decode_image(blob), self.tile_hw)
                    hw[j] = (h, w)
            else:
                _, _, ok = out
                for j in np.nonzero(~ok)[0]:  # rare per-image fallback
                    from pytorch_object_detection_tpu.data.decode import decode_image

                    tiles[j], (h, w) = decode_to_tile(
                        decode_image(blobs[j]), self.tile_hw)
                    hw[j] = (h, w)
            np.minimum(hw, np.asarray(self.tile_hw, np.int32), out=hw)
        else:
            hw[:] = np.asarray(self.tile_hw, np.int32)
        ch, cw = self.canvas_hw
        scale = np.minimum(ch / np.maximum(hw[:, 0], 1),
                           cw / np.maximum(hw[:, 1], 1)).astype(np.float32)
        raw = self.boxes_all[chunk]
        boxes = np.where(raw >= 0.0, raw * scale[:, None, None], -1.0)
        return Batch(tiles, boxes, self.labels_all[chunk], scale,
                     hw[:, 1].copy(), [self._ids[i] for i in chunk],
                     n_real, hw[:, 0].copy())

    def __iter__(self):
        indices = self._indices()
        self.epoch += 1
        n_batches = len(self) if not self.drop_last else len(indices) // self.batch_size

        free_q: "queue.Queue" = queue.Queue()
        for s in range(self.depth):
            free_q.put(s)
        out_q: "queue.Queue" = queue.Queue()
        stop = threading.Event()

        def producer():
            for bi in range(n_batches):
                if stop.is_set():
                    return
                slot = free_q.get()
                chunk = indices[bi * self.batch_size : (bi + 1) * self.batch_size]
                out_q.put((slot, self._produce(chunk, slot)))
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        held: List[int] = []
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                slot, batch = item
                # the consumer may still be transferring the PREVIOUS slot;
                # recycle slots depth-1 batches behind the one yielded
                held.append(slot)
                if len(held) > self.depth - 1:
                    free_q.put(held.pop(0))
                yield batch
        finally:
            stop.set()
            free_q.put(0)  # unblock a producer waiting on a slot
