"""End-to-end-from-bytes benchmark: JPEG byte streams -> detections.

BASELINE's headline metric says "end-to-end eval"; the reference's COCO
eval loop (Test_coco.py:137-171) includes the per-image host decode.  This
bench measures that full path on this host:

    JPEG bytes -> native libjpeg batch decode (C++ thread pool, GIL
    released) -> fixed uint8 tiles -> H2D -> device aspect-preserving
    resize onto the 512x512 canvas -> int8 HISFCOS forward -> decode ->
    NMS, sustained img/s with the host decode overlapped against device
    compute (producer thread, queue depth 2).

Three numbers are reported (stderr; the ONE stdout JSON line is the
overlapped end-to-end rate — the driver contract):

- decode-only rate for 1/2/4 decoder threads (the host scaling curve;
  on this 1-core host the curve is flat and decode IS the knee),
- cached-tiles serving rate (tiles pre-decoded in host RAM: isolates
  H2D + device compute — what the same chip does behind a multi-core
  decode host),
- overlapped end-to-end-from-bytes rate (the headline).

Reuses bench.py's calibration/state cache (same cache key as the synthetic
bench) and the persistent XLA compilation cache, so warm runs skip both
calibration and compiles.

Env: PODT_JPEG_N (corpus size, default 1024), PODT_BENCH_BATCH (128).
"""
from __future__ import annotations

import io
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (bench.py at repo root: cache + state helpers)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

HW = (512, 512)
TILE = (512, 512)


def _log(msg: str) -> None:
    bench._log(f"[jpeg] {msg}")


def make_corpus(n: int) -> list:
    """n synthetic VOC-sized JPEGs (bytes).  Structured content (gradients
    + boxes + noise) so libjpeg does representative work; cached on disk —
    encode time is not part of any measurement."""
    path = bench.CACHE_DIR / f"jpeg_corpus_{n}.npy"
    if path.exists():
        blobs = np.load(path, allow_pickle=True)
        return list(blobs)
    from PIL import Image

    rng = np.random.default_rng(0)
    blobs = []
    for i in range(n):
        h = int(rng.integers(333, 512))
        w = int(rng.integers(400, 512))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 255 / w),
                (yy * 255 / h),
                ((xx + yy) * 255 / (h + w)),
            ],
            axis=-1,
        ).astype(np.float32)
        # a few solid "objects" + sensor noise
        for _ in range(6):
            y0, x0 = rng.integers(0, h - 40), rng.integers(0, w - 40)
            bh, bw = rng.integers(20, min(160, h - y0)), rng.integers(20, min(160, w - x0))
            img[y0 : y0 + bh, x0 : x0 + bw] = rng.integers(0, 255, 3)
        img += rng.normal(0, 6, img.shape)
        pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
        buf = io.BytesIO()
        pil.save(buf, format="JPEG", quality=80)
        blobs.append(buf.getvalue())
    bench.CACHE_DIR.mkdir(parents=True, exist_ok=True)
    np.save(path, np.asarray(blobs, dtype=object), allow_pickle=True)
    return blobs


def decode_rate_curve(blobs):
    from pytorch_object_detection_tpu.native.lib import jpeg_decode_batch_native

    sample = blobs[:256]
    rates = {}
    # full-size warm pass: the [256,512,512,3] output allocation page-faults
    # ~200 MB on first touch, which otherwise lands in the first timing
    jpeg_decode_batch_native(sample, TILE, n_threads=4)
    for nt in (1, 2, 4):
        jpeg_decode_batch_native(sample[:16], TILE, n_threads=nt)  # warm
        t0 = time.perf_counter()
        out = jpeg_decode_batch_native(sample, TILE, n_threads=nt)
        dt = time.perf_counter() - t0
        assert out is not None and out[2].all()
        rates[nt] = len(sample) / dt
        _log(f"decode-only, {nt} thread(s): {rates[nt]:.1f} img/s")
    return rates


def build_detect(batch_size: int):
    """One jitted program: u8 tiles + src sizes -> resize -> int8 HISFCOS
    -> decode+NMS -> checksum scalar."""
    from pytorch_object_detection_tpu.data.pipeline import make_device_resize
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.ops.postprocess import decode_detections
    from pytorch_object_detection_tpu.train.trainer import make_eval_forward_int8

    model = HISFCOS(num_classes=20)
    # This bench hard-codes HISFCOS with the full int8 ladder; pin exactly
    # those inputs into the cache key (rather than inheriting whatever
    # PODT_BENCH_MODEL / PODT_INT8_* happen to be in the env) so the state
    # written here is the one bench.py's default int8 run would also build.
    skey = bench._state_key(
        "int8", HW, 20, name="hisfcos",
        knob_overrides={"PODT_INT8_FPN": "1", "PODT_INT8_HEAD": "1"},
    )
    # same calibration recipe (and therefore same cache entry) as bench.py
    calib = bench.int8_calib_images(HW)
    state = bench._cached_state(
        skey, lambda: bench.fcos_int8_state(model, HW, calib, True, True)
    )
    params, batch_stats, qtree = state["params"], state["batch_stats"], state["qtree"]
    fwd = make_eval_forward_int8(
        model, compute_dtype=jnp.bfloat16, int8_fpn=True, int8_head=True,
        u8_input=True,
    )
    resize = make_device_resize(HW)
    strides = [8, 16, 32, 64, 128]

    def program(qtree, params, batch_stats, tiles_u8, src_hw):
        canvas_u8, _scale, _content = resize(tiles_u8, src_hw)
        cls_l, cnt_l, reg_l = fwd(qtree, params, batch_stats, canvas_u8)
        det = decode_detections(
            cls_l, cnt_l, reg_l, strides,
            score_threshold=0.05, nms_iou=0.6, max_detections=1000,
            image_hw=HW, nms_impl="pallas",
        )
        return det.scores.sum() + det.valid.sum()

    jp = jax.jit(program)
    return lambda tiles, hw: jp(qtree, params, batch_stats, tiles, hw)


def run_cached_tiles(detect, tiles, hws, batch_size, iters=16):
    """Tiles already in host RAM: H2D + device compute only."""
    n = tiles.shape[0]
    t0 = time.perf_counter()
    prev = None
    for i in range(iters):
        s = (i * batch_size) % (n - batch_size + 1)
        chk = detect(tiles[s : s + batch_size], hws[s : s + batch_size])
        if prev is not None:
            float(prev)
        prev = chk
    float(prev)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def run_from_bytes(detect, blobs, batch_size):
    """Overlapped: producer thread decodes (GIL-released C++), main thread
    feeds the device; completion forced one batch behind."""
    from pytorch_object_detection_tpu.native.lib import jpeg_decode_batch_native

    batches = [
        blobs[s : s + batch_size] for s in range(0, len(blobs) - batch_size + 1, batch_size)
    ]
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def producer():
        for bb in batches:
            out = jpeg_decode_batch_native(bb, TILE)
            q.put((out[0], out[1]))
        q.put(None)

    th = threading.Thread(target=producer, daemon=True)
    t0 = time.perf_counter()
    th.start()
    prev = None
    done = 0
    while True:
        item = q.get()
        if item is None:
            break
        tiles, hws = item
        chk = detect(tiles, hws)
        if prev is not None:
            float(prev)
        prev = chk
        done += batch_size
    float(prev)
    dt = time.perf_counter() - t0
    th.join()
    return done / dt


def main():
    batch_size = int(os.environ.get("PODT_BENCH_BATCH", "128"))
    n = int(os.environ.get("PODT_JPEG_N", "1024"))
    blobs = make_corpus(n)
    _log(f"corpus ready: {n} JPEGs")

    rates = decode_rate_curve(blobs)

    detect = build_detect(batch_size)
    from pytorch_object_detection_tpu.native.lib import jpeg_decode_batch_native

    tiles, hws, ok = jpeg_decode_batch_native(blobs[: max(256, batch_size)], TILE)
    assert ok.all()
    _log("warmup detect (compile)")
    float(detect(tiles[:batch_size], hws[:batch_size]))

    cached = run_cached_tiles(detect, tiles, hws, batch_size)
    _log(f"cached-tiles serving (H2D + device only): {cached:.1f} img/s")

    e2e = run_from_bytes(detect, blobs, batch_size)
    _log(
        f"end-to-end from JPEG bytes: {e2e:.1f} img/s "
        f"(decode 1-thread {rates[1]:.0f} img/s is the host knee on this "
        f"{os.cpu_count()}-core host)"
    )

    print(
        json.dumps(
            {
                "metric": "hisfcos_e2e_from_jpeg_bytes_images_per_sec_512px_int8",
                "value": round(e2e, 2),
                "unit": "images/sec",
                "vs_baseline": round(e2e / bench.BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
