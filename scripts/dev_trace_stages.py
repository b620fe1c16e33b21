"""Per-stage device-time attribution for the shipped int8 pipeline.

Traces backbone / FPN / head / decode as separate jitted modules and prints
each module's device time from the XLA Modules trace line.
"""
from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, HW = 64, (512, 512)
LOGDIR = "/tmp/jax-trace-stages"
ITERS = 6


def main():
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.nn.fused_fpn import hisfpn_folded_forward
    from pytorch_object_detection_tpu.nn.resnet_int8 import resnet50_int8_forward
    from pytorch_object_detection_tpu.ops.postprocess import decode_detections
    from pytorch_object_detection_tpu.train.trainer import _cast_tree, quantize_backbone

    model = HISFCOS(num_classes=20)
    variables = jax.jit(lambda r, x: model.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3), jnp.float32)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, *HW, 3), jnp.float32)
    qtree = quantize_backbone(model, variables, images[:8])
    strides = [8, 16, 32, 64, 128]

    bb = jax.jit(lambda q, x: resnet50_int8_forward(q, x, jnp.bfloat16, backend="pallas_block"))
    fpn = jax.jit(
        lambda p, s, feats: hisfpn_folded_forward(p["fpn"], s["fpn"], feats, jnp.bfloat16),
        static_argnums=(),
    )

    from pytorch_object_detection_tpu.models.heads import HISHead

    head_mod = HISHead(num_classes=20)

    def head_fn(p, s, levels):
        hv = {"params": _cast_tree(p["head"], jnp.bfloat16)}
        cls_l, cnt_l, reg_l = head_mod.apply(hv, levels)
        f32 = lambda xs: [x.astype(jnp.float32) for x in xs]
        return f32(cls_l), f32(cnt_l), f32(reg_l)

    head = jax.jit(head_fn)

    def dec_fn(cls_l, cnt_l, reg_l):
        det = decode_detections(
            cls_l, cnt_l, reg_l, strides, score_threshold=0.05, nms_iou=0.6,
            max_detections=1000, image_hw=HW, nms_impl="pallas",
        )
        return det.scores.sum() + det.valid.sum()

    dec = jax.jit(dec_fn)

    feats = bb(qtree, images)
    levels = fpn(params, batch_stats, feats)
    outs = head(params, batch_stats, levels)
    chk = dec(*outs)
    float(chk)

    jax.profiler.start_trace(LOGDIR)
    for _ in range(ITERS):
        feats = bb(qtree, images)
        levels = fpn(params, batch_stats, feats)
        outs = head(params, batch_stats, levels)
        chk = dec(*outs)
    float(chk)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        agg = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        print(f"== {plane.name} per-module ms/iter ==")
        for name, ms in agg.most_common():
            print(f"{ms / max(cnt[name], 1):8.3f} ms x{cnt[name]:2d}  {name[:80]}")


if __name__ == "__main__":
    main()
