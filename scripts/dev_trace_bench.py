"""Capture a profiler trace of the bench eval pipeline and dump per-op HLO
stats (self-time ranked) so optimization targets are fact-based."""
from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, HW = 64, (512, 512)
LOGDIR = "/tmp/jax-trace-bench"


def build_pipeline():
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.ops.postprocess import decode_detections
    from pytorch_object_detection_tpu.train.trainer import make_eval_forward

    model = HISFCOS(num_classes=20)
    variables = jax.jit(lambda r, x: model.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3), jnp.float32)
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    fwd = make_eval_forward(model, compute_dtype=jnp.bfloat16)
    strides = [8, 16, 32, 64, 128]

    @jax.jit
    def eval_pipeline(params, batch_stats, images):
        cls_l, cnt_l, reg_l = fwd(params, batch_stats, images)
        det = decode_detections(
            cls_l, cnt_l, reg_l, strides,
            score_threshold=0.05, nms_iou=0.6, max_detections=1000, image_hw=HW,
        )
        return det.scores.sum() + det.valid.sum()

    return eval_pipeline, params, batch_stats


def main():
    pipeline, params, stats = build_pipeline()
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, *HW, 3), jnp.float32)
    float(pipeline(params, stats, images))  # compile + warm

    jax.profiler.start_trace(LOGDIR)
    chks = [pipeline(params, stats, images) for _ in range(6)]
    float(chks[-1])
    jax.profiler.stop_trace()

    xplanes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("hlo_stats", "op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool + "^", {})
            out = f"/tmp/{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print("wrote", out, len(data))
        except Exception as e:
            print(tool, "failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
