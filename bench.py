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

Timing note: on the axon tunnel `block_until_ready` does not actually wait
for device completion, so each iteration's completion is forced by fetching
a scalar checksum; fetches are pipelined one batch behind submission so the
device queue stays full (sustained-throughput measurement, not latency).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_IMAGES_PER_SEC = 2000.0  # BASELINE.json target (v5e chip)


def build_pipeline(mode: str, hw, batch_size: int):
    from pytorch_object_detection_tpu.models.fcos import FCOS, HISFCOS, MNFCOS
    from pytorch_object_detection_tpu.ops.postprocess import decode_detections
    from pytorch_object_detection_tpu.train.trainer import (
        make_eval_forward,
        make_eval_forward_int8,
        quantize_backbone,
    )

    # PODT_BENCH_MODEL switches the model family (the quantize_*/
    # make_eval_forward_int8 helpers dispatch on the model class);
    # PODT_BENCH_CLASSES=80 benches the COCO head (pred pad 96, not 32)
    from pytorch_object_detection_tpu.models.retinanet import RetinaNet
    from pytorch_object_detection_tpu.models.ssd import SSD300

    cls = {"hisfcos": HISFCOS, "fcos": FCOS, "mnfcos": MNFCOS,
           "retinanet": RetinaNet, "ssd300": SSD300}[
        os.environ.get("PODT_BENCH_MODEL", "hisfcos").lower()]
    kw = {"num_classes": int(os.environ.get("PODT_BENCH_CLASSES", "20"))}
    if cls is SSD300:
        kw["num_classes"] += 1  # background class (registry convention)
        hw = (300, 300)  # SSD300 is defined at exactly 300x300
    if os.environ.get("PODT_BENCH_BACKBONE"):  # e.g. efficientnet-b0 (FCOS)
        kw["backbone"] = os.environ["PODT_BENCH_BACKBONE"]
    model = cls(**kw)
    rng = jax.random.PRNGKey(0)
    # jit the init: un-jitted linen init dispatches op-by-op through the
    # axon tunnel (minutes); jitted it is one program.
    variables = jax.jit(lambda r, x: model.init(r, x, False))(
        rng, jnp.zeros((1, *hw, 3), jnp.float32)
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    strides = [8, 16, 32, 64, 128]
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch_size, *hw, 3), jnp.float32)

    if isinstance(model, (RetinaNet, SSD300)):
        # anchor family: decode is the anchor codec; int8 is the
        # models/{retinanet,ssd}_int8.py ladder (normalized float input — no
        # u8-stem fold on this path yet)
        from pytorch_object_detection_tpu.models.ssd import default_boxes
        from pytorch_object_detection_tpu.ops.anchors import (
            decode_anchor_detections,
            generate_anchors,
        )

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

                qtree = quantize_ssd300(model, variables, images[:8])
                int8_fwd = lambda qt, im: ssd300_int8_forward(model, qt, im)
            else:
                from pytorch_object_detection_tpu.models.retinanet_int8 import (
                    quantize_retinanet,
                    retinanet_int8_forward,
                )

                qtree = quantize_retinanet(model, variables, images[:8],
                                           backend=backend)
                int8_fwd = lambda qt, im: retinanet_int8_forward(
                    model, qt, im, backend=backend)

            def eval_pipeline(qtree, anchors, images):
                loc, cl = int8_fwd(qtree, images)
                det = decode_anchor_detections(
                    anchors, loc, cl, act, 0.05, 0.5, 1000, hw)
                return det.scores.sum() + det.valid.sum()

            jp = jax.jit(eval_pipeline)
            return (lambda: jp(qtree, anchors, images)), images

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

    if mode == "int8":
        int8_fpn = os.environ.get("PODT_INT8_FPN", "1") == "1"
        int8_head = int8_fpn and os.environ.get("PODT_INT8_HEAD", "1") == "1"
        qtree = quantize_backbone(model, variables, images[:8])
        if int8_fpn:
            from pytorch_object_detection_tpu.train.trainer import (
                quantize_fpn,
                quantize_head,
            )

            qfpn = quantize_fpn(model, variables, qtree, images[:8])
            qtree = {"backbone": qtree, "fpn": qfpn}
            if int8_head:
                qtree["head"] = quantize_head(
                    model, variables, qtree["backbone"], qfpn, images[:8])
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
            # the parameter and inserts a 4.4 ms relayout copy (PERF.md r3)
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            fmt = Format(Layout(major_to_minor=(0, 1, 2, 3, 4)),
                         SingleDeviceSharding(jax.devices()[0]))
            images = jax.device_put(images, fmt)
            eval_pipeline = jax.jit(eval_pipeline,
                                    in_shardings=(None, None, None, fmt))
        else:
            eval_pipeline = jax.jit(eval_pipeline)

        return (lambda: eval_pipeline(qtree, params, batch_stats, images)), images

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


def main(batch_size: int = int(os.environ.get("PODT_BENCH_BATCH", "128")), iters: int = 25, hw=(512, 512)):
    mode = os.environ.get("PODT_BENCH_MODE", "int8")
    if os.environ.get("PODT_BENCH_HW"):  # e.g. "896x1408" (COCO canvas)
        hw = tuple(int(v) for v in os.environ["PODT_BENCH_HW"].split("x"))
    if os.environ.get("PODT_BENCH_MODEL", "").lower() == "ssd300":
        hw = (300, 300)  # SSD300's fixed canvas (build_pipeline pins it too)
    try:
        run, _ = build_pipeline(mode, hw, batch_size)
        float(run())  # compile + warm
    except Exception:
        if mode == "bf16":
            raise
        import traceback

        traceback.print_exc()
        mode = "bf16"
        run, _ = build_pipeline(mode, hw, batch_size)
        float(run())

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
    print(
        json.dumps(
            {
                "metric": f"{mdl}_e2e_eval_images_per_sec_{hw[0]}x{hw[1]}_{mode}"
                if hw != (512, 512)
                else f"{mdl}_e2e_eval_images_per_sec_512px_{mode}",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception:  # tunnel flake insurance: one retry
        import traceback

        traceback.print_exc()
        main()
