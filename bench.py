"""End-to-end eval throughput benchmark (the BASELINE headline metric).

Measures sustained images/sec for the full detection production pipeline on
one chip at 512x512: HISFCOS forward + decode + top-k + NMS, all on device
— the TPU counterpart of the reference's eval timing loop
(test.py:198-223, ~50 FPS at batch 1 on the author's GPU; TPU target
2,000 img/s/chip).

Serving config (default, PODT_BENCH_MODE=int8): int8-PTQ ResNet-50 backbone
through the fused Pallas bottleneck kernels (ops/pallas_qblock — one HBM
read/write per block), bf16 FPN + head.  PODT_BENCH_MODE=bf16 measures the
plain bf16 path; any failure in the int8 build falls back to bf16.

Input contract (default PODT_BENCH_INPUT=view): a raw C-contiguous RGBX
uint8 frame buffer — the standard image-decoder output — handed to JAX as
the [B, H/2, 2, W/2, 8] view of the same bytes with a pinned row-major
layout, so the device runs ZERO input-prep ops (no pad/s2d/relayout; the
s2d row merge happens inside the stem kernel).  PODT_BENCH_INPUT=rgb
measures the 3-channel form (device-side pad + s2d transpose, ~4 ms
slower at B=128); both produce bit-identical detections (tests).

PODT_BENCH_SOURCE=jpeg switches to the end-to-end-from-bytes pipeline:
real JPEG byte streams -> native libjpeg batch decode (C++ threads) ->
device tiles -> detect; reports sustained img/s from bytes (the
reference's Test_coco.py:137-171 loop includes the data loading).

Startup budget: all expensive one-time state (model init + int8
calibration) is cached under runs/bench_cache/ keyed on the bench config +
a package-source digest, and XLA compilations go to a persistent
compilation cache — a warm run does no calibration and (almost) no
compilation.  PODT_BENCH_REFRESH=1 forces recalibration;
PODT_BENCH_MAX_SECONDS (default 300) time-boxes fallbacks/retries so the
process never doubles an already-long run.

Timing note: on the axon tunnel `block_until_ready` does not actually wait
for device completion, so each iteration's completion is forced by fetching
a scalar checksum; fetches are pipelined one batch behind submission so the
device queue stays full (sustained-throughput measurement, not latency).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import hashlib
import json
import os
import pathlib
import pickle
import sys
import time

_T0 = time.perf_counter()

import jax
import jax.numpy as jnp

BASELINE_IMAGES_PER_SEC = 2000.0  # BASELINE.json target (v5e chip)
_ROOT = pathlib.Path(__file__).resolve().parent
CACHE_DIR = _ROOT / "runs" / "bench_cache"
MAX_SECONDS = float(os.environ.get("PODT_BENCH_MAX_SECONDS", "300"))


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _log(msg: str) -> None:
    print(f"[bench +{_elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache — opt-in (PODT_BENCH_XLA_CACHE=1),
    default OFF.

    Measured on this box (r4): jax 0.9 + the axon plugin DROP custom array
    layouts on executables/transfers touched by the disk cache — both
    ``device_put(x, Format(...))`` and ``jit(identity, out_shardings=
    Format(...))`` return the default tiled layout (0,1,2,4,3) instead of
    the pinned row-major (0,1,2,3,4) once cache entries exist, even when
    the cache dir is switched off around the call (lookups appear to ride
    config captured earlier), which silently breaks the pinned-layout
    serving programs.  Meanwhile the big eval-program compiles showed NO
    disk-cache benefit (bf16 pipeline: 50 s cold vs 66 s "warm").  The
    warm-run startup win comes from the STATE cache (calibration pkl:
    280 s -> 1.7 s), so the XLA disk cache is all risk and no reward here.
    """
    if os.environ.get("PODT_BENCH_XLA_CACHE") != "1":
        return
    try:
        CACHE_DIR.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR / "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization, never fatal
        _log(f"compilation cache unavailable: {e!r}")


_enable_compile_cache()


class _no_compile_cache:
    """Window with the persistent compilation cache OFF (see
    _enable_compile_cache — layout-pinned programs must never touch the
    disk cache; a no-op in the default cache-off configuration)."""

    def __enter__(self):
        self._prev = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)

    def __exit__(self, *exc):
        jax.config.update("jax_compilation_cache_dir", self._prev)


# --------------------------------------------------------------------------
# On-disk state cache (model params + int8 calibration trees).
#
# Calibration runs dozens of small jitted programs through the device
# tunnel; on the axon link that costs minutes of round-trips.  The result
# is a plain pytree of arrays, so we pickle it as numpy keyed on the bench
# config + a digest of the package sources (any code change invalidates).


def _package_digest() -> str:
    h = hashlib.sha256()
    pkg = _ROOT / "pytorch_object_detection_tpu"
    for p in sorted(pkg.rglob("*.py")):
        h.update(p.read_bytes())
    return h.hexdigest()[:16]


def _state_key(mode: str, hw, num_classes: int, *, name: str | None = None,
               knob_overrides: dict | None = None) -> str:
    # everything that changes the cached state; batch size / input form /
    # iter count only shape the timed program, not params or calibration.
    # ``name``/``knob_overrides`` let other entry points (scripts/bench_jpeg)
    # pin the inputs they hard-code instead of inheriting unrelated env.
    knobs = {
        k: v
        for k, v in sorted(os.environ.items())
        if k.startswith("PODT_")
        and k not in (
            "PODT_BENCH_BATCH", "PODT_BENCH_INPUT", "PODT_BENCH_RGBX",
            "PODT_BENCH_ITERS", "PODT_BENCH_MAX_SECONDS",
            "PODT_BENCH_REFRESH", "PODT_BENCH_SOURCE",
        )
    }
    if knob_overrides:
        knobs.update(knob_overrides)
    if name is None:
        name = os.environ.get("PODT_BENCH_MODEL", "hisfcos").lower()
    else:
        knobs["PODT_BENCH_MODEL"] = name
    blob = json.dumps([mode, list(hw), num_classes, knobs, _package_digest()])
    return f"{name}_{mode}_{hashlib.sha256(blob.encode()).hexdigest()[:16]}"


def int8_calib_images(hw):
    """The int8 calibration sample every bench entry point shares.

    Batch-size independent by construction (always drawn as a [128, H, W, 3]
    uniform sample, first 8 taken, IMAGENET-normalized) so the cached state
    under one ``_state_key`` is identical no matter which script — or which
    PODT_BENCH_BATCH — built it first."""
    import jax
    import jax.numpy as jnp

    from pytorch_object_detection_tpu.data.pipeline import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    images = jax.random.uniform(jax.random.PRNGKey(1), (128, *hw, 3),
                                jnp.float32)
    return (images[:8] - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def _cached_state(key: str, build):
    import numpy as np

    path = CACHE_DIR / f"{key}.pkl"
    if os.environ.get("PODT_BENCH_REFRESH") != "1" and path.exists():
        try:
            with open(path, "rb") as f:
                tree = pickle.load(f)
            _log(f"state cache hit: {path.name}")
            return jax.tree_util.tree_map(jnp.asarray, tree)
        except Exception as e:
            _log(f"state cache unreadable ({e!r}); rebuilding")
    state = build()
    try:
        CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = str(path) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, state), f)
        os.replace(tmp, path)
        _log(f"state cached: {path.name}")
    except Exception as e:
        _log(f"state cache write failed: {e!r}")
    return state


def init_model_variables(model, hw):
    """Jitted linen init (un-jitted init dispatches op-by-op through the
    axon tunnel — minutes)."""
    return jax.jit(lambda r, x: model.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), jnp.float32)
    )


def fcos_int8_state(model, hw, calib_images, int8_fpn: bool, int8_head: bool):
    """Init + the full int8 PTQ calibration ladder for a FCOS-family model.

    Returns the cacheable state dict {params, batch_stats, qtree} consumed
    by make_eval_forward_int8 (shared by bench.py and scripts/bench_jpeg.py
    through _cached_state)."""
    from pytorch_object_detection_tpu.train.trainer import quantize_backbone

    variables = init_model_variables(model, hw)
    qtree = quantize_backbone(model, variables, calib_images)
    if int8_fpn:
        from pytorch_object_detection_tpu.train.trainer import (
            quantize_fpn,
            quantize_head,
        )

        qfpn = quantize_fpn(model, variables, qtree, calib_images)
        qtree = {"backbone": qtree, "fpn": qfpn}
        if int8_head:
            qtree["head"] = quantize_head(
                model, variables, qtree["backbone"], qfpn, calib_images)
    return {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "qtree": qtree}


def build_pipeline(mode: str, hw, batch_size: int):
    from pytorch_object_detection_tpu.models.fcos import FCOS, HISFCOS, MNFCOS
    from pytorch_object_detection_tpu.ops.postprocess import decode_detections
    from pytorch_object_detection_tpu.train.trainer import (
        make_eval_forward,
        make_eval_forward_int8,
    )

    # PODT_BENCH_MODEL switches the model family (the quantize_*/
    # make_eval_forward_int8 helpers dispatch on the model class);
    # PODT_BENCH_CLASSES=80 benches the COCO head (pred pad 96, not 32)
    from pytorch_object_detection_tpu.models.mcfcos import MC_FCOS
    from pytorch_object_detection_tpu.models.retinanet import RetinaNet
    from pytorch_object_detection_tpu.models.ssd import SSD300

    cls = {"hisfcos": HISFCOS, "fcos": FCOS, "mnfcos": MNFCOS,
           "mcfcos": MC_FCOS, "retinanet": RetinaNet, "ssd300": SSD300}[
        os.environ.get("PODT_BENCH_MODEL", "hisfcos").lower()]
    kw = {"num_classes": int(os.environ.get("PODT_BENCH_CLASSES", "20"))}
    if cls is SSD300:
        kw["num_classes"] += 1  # background class (registry convention)
        if os.environ.get("PODT_BENCH_HW"):
            _log("warning: PODT_BENCH_HW ignored — SSD300 is defined at "
                 "exactly 300x300")
        hw = (300, 300)  # SSD300 is defined at exactly 300x300
    if os.environ.get("PODT_BENCH_BACKBONE"):  # e.g. efficientnet-b0 (FCOS)
        kw["backbone"] = os.environ["PODT_BENCH_BACKBONE"]
    model = cls(**kw)
    skey = _state_key(mode, hw, kw["num_classes"])
    # MC_FCOS is the reference's 4-level variant (Mc_Fcos.py:144-185)
    strides = [8, 16, 32, 64] if cls is MC_FCOS else [8, 16, 32, 64, 128]
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch_size, *hw, 3), jnp.float32)

    init_variables = lambda: init_model_variables(model, hw)

    if isinstance(model, (RetinaNet, SSD300)):
        # anchor family: decode is the anchor codec; int8 is the
        # models/{retinanet,ssd}_int8.py ladder (normalized float input — no
        # u8-stem fold on this path yet)
        from pytorch_object_detection_tpu.data.pipeline import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        from pytorch_object_detection_tpu.models.ssd import default_boxes
        from pytorch_object_detection_tpu.ops.anchors import (
            decode_anchor_detections,
            generate_anchors,
        )

        # serving feeds IMAGENET-normalized frames; calibrate and time on
        # the same distribution so the benched numerics match the eval path
        images = (images - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

        if isinstance(model, SSD300):
            anchors, act = default_boxes(hw[0]), "softmax_bg0"
        else:
            anchors, act = generate_anchors(model.level_shapes(hw), strides), "sigmoid"
        backend = "xla" if jax.devices()[0].platform == "cpu" else "pallas_block"
        if mode == "int8":
            if isinstance(model, SSD300):
                from pytorch_object_detection_tpu.models.ssd_int8 import (
                    quantize_ssd300,
                    ssd300_int8_forward,
                )

                qtree = _cached_state(
                    skey, lambda: quantize_ssd300(model, init_variables(),
                                                  images[:8]))
                int8_fwd = lambda qt, im: ssd300_int8_forward(model, qt, im)
            else:
                from pytorch_object_detection_tpu.models.retinanet_int8 import (
                    quantize_retinanet,
                    retinanet_int8_forward,
                )

                qtree = _cached_state(
                    skey, lambda: quantize_retinanet(model, init_variables(),
                                                     images[:8], backend=backend))
                int8_fwd = lambda qt, im: retinanet_int8_forward(
                    model, qt, im, backend=backend)

            def eval_pipeline(qtree, anchors, images):
                loc, cl = int8_fwd(qtree, images)
                det = decode_anchor_detections(
                    anchors, loc, cl, act, 0.05, 0.5, 1000, hw)
                return det.scores.sum() + det.valid.sum()

            jp = jax.jit(eval_pipeline)
            return (lambda: jp(qtree, anchors, images)), images

        state = _cached_state(skey, init_variables)
        params, batch_stats = state["params"], state.get("batch_stats", {})

        def eval_pipeline(params, batch_stats, anchors, images):
            v = {"params": jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), params)}
            if batch_stats:
                v["batch_stats"] = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16), batch_stats)
            loc, cl = model.apply(v, images.astype(jnp.bfloat16), False)
            det = decode_anchor_detections(
                anchors, loc.astype(jnp.float32), cl.astype(jnp.float32),
                act, 0.05, 0.5, 1000, hw)
            return det.scores.sum() + det.valid.sum()

        jp = jax.jit(eval_pipeline)
        return (lambda: jp(params, batch_stats, anchors, images)), images

    if cls is MC_FCOS and mode == "int8":
        # MC_FCOS: one-shot full-detector ladder (models/mcfcos_int8.py)
        from pytorch_object_detection_tpu.data.pipeline import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        from pytorch_object_detection_tpu.models.mcfcos_int8 import (
            mcfcos_int8_forward,
            quantize_mcfcos,
        )

        backend = "xla" if jax.devices()[0].platform == "cpu" else "pallas_block"
        calib = int8_calib_images(hw)
        qtree = _cached_state(
            skey,
            lambda: quantize_mcfcos(model, init_variables(), calib,
                                    backend=backend),
        )
        images = jax.random.randint(
            jax.random.PRNGKey(1), (batch_size, *hw, 3), 0, 256, jnp.uint8)

        def eval_pipeline(qtree, images):
            cls_l, cnt_l, reg_l = mcfcos_int8_forward(
                model, qtree, images, backend=backend, u8_stem=True)
            det = decode_detections(
                cls_l, cnt_l, reg_l, strides,
                score_threshold=0.05, nms_iou=0.6, max_detections=1000,
                image_hw=hw, nms_impl="pallas",
            )
            return det.scores.sum() + det.valid.sum()

        jp = jax.jit(eval_pipeline)
        return (lambda: jp(qtree, images)), images

    if mode == "int8":
        from pytorch_object_detection_tpu.data.pipeline import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        int8_fpn = os.environ.get("PODT_INT8_FPN", "1") == "1"
        int8_head = int8_fpn and os.environ.get("PODT_INT8_HEAD", "1") == "1"
        # calibrate on the serving distribution: IMAGENET-normalized frames
        # (shared helper — bench_jpeg must build the identical state)
        calib = int8_calib_images(hw)
        state = _cached_state(
            skey,
            lambda: fcos_int8_state(model, hw, calib, int8_fpn, int8_head),
        )
        params, batch_stats = state["params"], state["batch_stats"]
        qtree = state["qtree"]
        u8_input = os.environ.get("PODT_U8_STEM", "1") == "1"
        fwd = make_eval_forward_int8(
            model, compute_dtype=jnp.bfloat16,
            fused_head=os.environ.get("PODT_FUSED_HEAD", "0") == "1",
            fuse_strided=os.environ.get("PODT_FUSE_STRIDED", "1") == "1",
            use_pallas_gn=os.environ.get("PODT_PALLAS_GN", "0") == "1",
            int8_fpn=int8_fpn, int8_head=int8_head, u8_input=u8_input,
        )
        if u8_input:
            # serving input contract: RAW uint8 frames — normalize is folded
            # into the exact s2d stem kernel.  PODT_BENCH_INPUT picks the
            # frame spec: rgb ([B,H,W,3]), rgbx ([B,H,W,4] — standard
            # decoder output), view ([B,H/2,2,W/2,8] — the SAME RGBX byte
            # buffer described 5D; zero-cost host view, zero device prep).
            form = os.environ.get("PODT_BENCH_INPUT",
                                  os.environ.get("PODT_BENCH_RGBX", "view"))
            if form in ("1", "rgbx"):
                shape = (batch_size, *hw, 4)
            elif form == "view":
                shape = (batch_size, hw[0] // 2, 2, hw[1] // 2, 8)
            else:
                shape = (batch_size, *hw, 3)
            images = jax.random.randint(
                jax.random.PRNGKey(1), shape, 0, 256, jnp.uint8
            )

        def eval_pipeline(qtree, params, batch_stats, images):
            cls_l, cnt_l, reg_l = fwd(qtree, params, batch_stats, images)
            det = decode_detections(
                cls_l, cnt_l, reg_l, strides,
                score_threshold=0.05, nms_iou=0.6, max_detections=1000, image_hw=hw,
                nms_impl="pallas",
            )
            return det.scores.sum() + det.valid.sum()

        if images.ndim == 5:
            # pin the frame buffer's layout to row-major (== the Pallas stem
            # operand constraint); otherwise XLA picks its own u8 layout for
            # the parameter and inserts a 4.4 ms relayout copy (PERF.md r3).
            # Layout-carrying programs must compile with the persistent
            # cache OFF (see _no_compile_cache); if the pin still fails,
            # serve the rgbx 4-channel form instead of losing int8.
            try:
                from jax.experimental.layout import Format, Layout
                from jax.sharding import SingleDeviceSharding

                _log("state on device; compiling pinned-layout program")
                with _no_compile_cache():
                    fmt = Format(Layout(major_to_minor=(0, 1, 2, 3, 4)),
                                 SingleDeviceSharding(jax.devices()[0]))
                    pinned = jax.device_put(images, fmt)
                    if tuple(pinned.format.layout.major_to_minor) != (
                            0, 1, 2, 3, 4):
                        # in-process relayout cache can still hand back the
                        # default tiled layout; the host-transfer route takes
                        # a different path and honors the pin
                        _log("device relayout ignored the pin; host route")
                        import numpy as _np

                        pinned = jax.device_put(
                            _np.asarray(jax.device_get(images)), fmt)
                    assert tuple(pinned.format.layout.major_to_minor) == (
                        0, 1, 2, 3, 4), pinned.format
                    jp = jax.jit(eval_pipeline,
                                 in_shardings=(None, None, None, fmt))
                    # compile + first run inside the no-cache window
                    float(jp(qtree, params, batch_stats, pinned))
                images = pinned
                eval_pipeline = jp
            except Exception as e:
                _log(f"layout pin failed ({type(e).__name__}); serving rgbx")
                images = jax.random.randint(
                    jax.random.PRNGKey(1), (batch_size, *hw, 4), 0, 256,
                    jnp.uint8)
                eval_pipeline = jax.jit(eval_pipeline)
        else:
            eval_pipeline = jax.jit(eval_pipeline)

        return (lambda: eval_pipeline(qtree, params, batch_stats, images)), images

    state = _cached_state(skey, init_variables)
    params, batch_stats = state["params"], state.get("batch_stats", {})
    fwd = make_eval_forward(model, compute_dtype=jnp.bfloat16)

    @jax.jit
    def eval_pipeline(params, batch_stats, images):
        cls_l, cnt_l, reg_l = fwd(params, batch_stats, images)
        det = decode_detections(
            cls_l, cnt_l, reg_l, strides,
            score_threshold=0.05, nms_iou=0.6, max_detections=1000, image_hw=hw,
        )
        return det.scores.sum() + det.valid.sum()

    return (lambda: eval_pipeline(params, batch_stats, images)), images


def main(batch_size: int = int(os.environ.get("PODT_BENCH_BATCH", "128")),
         iters: int = int(os.environ.get("PODT_BENCH_ITERS", "25")),
         hw=(512, 512)):
    if os.environ.get("PODT_BENCH_SOURCE", "").lower() == "jpeg":
        from scripts.bench_jpeg import main as jpeg_main

        return jpeg_main()
    mode = os.environ.get("PODT_BENCH_MODE", "int8")
    if os.environ.get("PODT_BENCH_HW"):  # e.g. "896x1408" (COCO canvas)
        hw = tuple(int(v) for v in os.environ["PODT_BENCH_HW"].split("x"))
    if os.environ.get("PODT_BENCH_MODEL", "").lower() == "ssd300":
        hw = (300, 300)  # SSD300's fixed canvas (build_pipeline pins it too)
    try:
        run, _ = build_pipeline(mode, hw, batch_size)
        _log("state ready; compiling + warmup")
        float(run())  # compile + warm
    except Exception:
        if mode == "bf16" or _elapsed() > MAX_SECONDS:
            raise
        import traceback

        traceback.print_exc()
        _log("int8 pipeline failed; falling back to bf16")
        mode = "bf16"
        run, _ = build_pipeline(mode, hw, batch_size)
        float(run())
    _log("warm; timing")

    t0 = time.perf_counter()
    prev_chk = None
    for _ in range(iters):
        chk = run()
        if prev_chk is not None:
            float(prev_chk)  # overlap: wait for batch i-1 while i runs
        prev_chk = chk
    float(prev_chk)
    dt = time.perf_counter() - t0

    images_per_sec = batch_size * iters / dt
    mdl = os.environ.get("PODT_BENCH_MODEL", "hisfcos").lower()
    if os.environ.get("PODT_BENCH_BACKBONE"):
        mdl += "_" + os.environ["PODT_BENCH_BACKBONE"].replace("-", "")
    _log(f"done: {images_per_sec:.1f} img/s over {iters}x{batch_size}")
    print(
        json.dumps(
            {
                # "device_eval": the full on-device eval path (H2D frames ->
                # resize/normalize -> forward -> decode -> NMS) fed from host
                # RAM.  The from-JPEG-bytes path (host decode included) is
                # scripts/bench_jpeg.py's *_from_jpeg_bytes_* metric — the
                # two are deliberately named apart (r4 review).
                "metric": f"{mdl}_device_eval_images_per_sec_{hw[0]}x{hw[1]}_{mode}"
                if hw != (512, 512)
                else f"{mdl}_device_eval_images_per_sec_512px_{mode}",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception:  # tunnel flake insurance: one retry (time-boxed)
        import traceback

        traceback.print_exc()
        if _elapsed() > MAX_SECONDS:
            raise
        main()
