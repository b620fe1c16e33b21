"""Pipeline parallelism (parallel/pp.py): the two-stage device pipeline must
produce the same detections as the single-device eval pipeline, with stage
params actually resident on distinct devices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.eval.evaluator import make_eval_pipeline
from pytorch_object_detection_tpu.models.fcos import HISFCOS
from pytorch_object_detection_tpu.parallel.pp import make_two_stage_pipeline

HW = (128, 128)
STRIDES = [8, 16, 32, 64, 128]


def test_two_stage_pipeline_matches_single_device():
    model = HISFCOS(num_classes=20, features=64)
    v = jax.jit(lambda r, x: model.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3))
    )
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 255, (2, *HW, 3), np.uint8) for _ in range(3)]

    ref_pipe = make_eval_pipeline(model, STRIDES, HW, max_detections=64,
                                  compute_dtype=jnp.float32)
    refs = [ref_pipe(v["params"], v.get("batch_stats", {}), jnp.asarray(b))
            for b in batches]

    run = make_two_stage_pipeline(
        model, v, STRIDES, HW, devices=jax.devices()[:2], max_detections=64,
        compute_dtype=jnp.float32,
    )
    outs = run(batches)

    # stage params live on their own devices; outputs on the second stage's
    d0, d1 = run.devices
    assert d0 != d1
    bb_leaf = jax.tree_util.tree_leaves(run.stage_params[0])[0]
    head_leaf = jax.tree_util.tree_leaves(run.stage_params[1])[0]
    assert bb_leaf.devices() == {d0}
    assert head_leaf.devices() == {d1}
    assert outs[0].scores.devices() == {d1}

    for ref, out in zip(refs, outs):
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
        np.testing.assert_array_equal(np.asarray(ref.classes), np.asarray(out.classes))
        np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(out.scores),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref.boxes), np.asarray(out.boxes),
                                   rtol=1e-5, atol=1e-4)
