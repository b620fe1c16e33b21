import jax
import pytest

# compile-heavy (measured in PARITY.md); the fast tier covers this
# subsystem through its cherry-picked/fast siblings
pytestmark = pytest.mark.slow
import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.data.synthetic import synthetic_batch
from pytorch_object_detection_tpu.models.fcos import HISFCOS
from pytorch_object_detection_tpu.parallel.mesh import batch_sharding, create_mesh, replicate_state, shard_batch
from pytorch_object_detection_tpu.train.schedules import poly_lr, warmup_step_decay
from pytorch_object_detection_tpu.train.trainer import (
    create_train_state,
    make_train_step,
    param_labels,
)

HW = (128, 128)
STRIDES = [8, 16, 32, 64, 128]
SHAPES = [(HW[0] // s, HW[1] // s) for s in STRIDES]
RANGES = [(-1, 32), (32, 96), (96, 192), (192, 384), (384, 9999999)]


def _small_state(rng=0):
    model = HISFCOS(num_classes=5, features=64)
    state = create_train_state(
        model,
        jax.random.PRNGKey(rng),
        (1, *HW, 3),
        {"lr": 1e-2, "warmup_steps": 10},
        freeze_bn=True,
        frozen_stages=1,
    )
    return model, state


@pytest.mark.fast
def test_schedule_warmup_and_decay():
    s = warmup_step_decay(0.01, 500, 1 / 3, [120000, 160000], 0.1)
    np.testing.assert_allclose(float(s(0)), 0.01 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 0.01 * (1 / 3 + 0.5 * 2 / 3), rtol=1e-5)
    np.testing.assert_allclose(float(s(1000)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(130000)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(s(170000)), 0.0001, rtol=1e-6)


@pytest.mark.fast
def test_poly_lr():
    s = poly_lr(0.01, 100, power=1.0)
    np.testing.assert_allclose(float(s(50)), 0.005, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 1e-6, rtol=1e-6)


def test_param_labels_freeze_bn_and_stage1():
    model, state = _small_state()
    labels = param_labels(state.params, freeze_bn=True, frozen_stages=1)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    as_str = {"/".join(p.key for p in path): v for path, v in flat}
    # all BN frozen
    assert all(v == "freeze" for k, v in as_str.items() if "/bn/" in k or k.endswith("/bn"))
    # stem + layer1 frozen, layer2+ trainable convs
    assert as_str["backbone/conv1/conv/kernel"] == "freeze"
    assert as_str["backbone/layer1_0/conv1/conv/kernel"] == "freeze"
    assert as_str["backbone/layer2_0/conv1/conv/kernel"] == "train"
    # head trains
    assert as_str["head/cls_pred/conv/kernel"] == "train"


def test_train_step_loss_decreases_and_frozen_params_stay():
    model, state = _small_state()
    step = make_train_step(model, SHAPES, STRIDES, RANGES, "giou", compute_dtype=jnp.float32)
    imgs, boxes, labels = synthetic_batch(jax.random.PRNGKey(1), 2, HW, 5, max_boxes=8)

    frozen_before = np.asarray(state.params["backbone"]["conv1"]["conv"]["kernel"])
    bn_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["backbone"]["bn1"])[0]
    )
    losses = []
    for _ in range(5):
        state, metrics = step(state, imgs, boxes, labels)
        losses.append(float(metrics["total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # frozen params unchanged after 5 steps
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["conv1"]["conv"]["kernel"]), frozen_before
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params["backbone"]["bn1"])[0]), bn_before
    )
    assert int(state.step) == 5


def test_train_step_data_parallel_mesh():
    """Full DP train step over the simulated 8-device mesh."""
    model, state = _small_state()
    mesh = create_mesh()
    assert mesh.devices.size == 8
    step = make_train_step(model, SHAPES, STRIDES, RANGES, "giou", compute_dtype=jnp.float32, donate=False)
    imgs, boxes, labels = synthetic_batch(jax.random.PRNGKey(2), 8, HW, 5, max_boxes=8)

    with mesh:
        state_r = replicate_state(mesh, state)
        batch = shard_batch(mesh, (imgs, boxes, labels))
        new_state, metrics = step(state_r, *batch)
    assert np.isfinite(float(metrics["total"]))
    # gradient must be identical to single-device run on the same global batch
    new_state_1, metrics_1 = make_train_step(
        model, SHAPES, STRIDES, RANGES, "giou", compute_dtype=jnp.float32, donate=False
    )(state, imgs, boxes, labels)
    np.testing.assert_allclose(float(metrics["total"]), float(metrics_1["total"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(new_state.params["head"])[0]
    b = jax.tree_util.tree_leaves(new_state_1.params["head"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_anchor_train_step_retinanet():
    """RetinaNet trains: loss finite and decreasing over a few steps."""
    from pytorch_object_detection_tpu.models.retinanet import RetinaNet
    from pytorch_object_detection_tpu.ops.anchors import generate_anchors
    from pytorch_object_detection_tpu.train.trainer import make_anchor_train_step

    hw = (128, 128)
    shapes = [(hw[0] // s, hw[1] // s) for s in STRIDES]
    anchors = generate_anchors(shapes, STRIDES)
    model = RetinaNet(num_classes=5, features=64)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, *hw, 3), {"lr": 1e-3})
    step = make_anchor_train_step(model, anchors, 5, compute_dtype=jnp.float32, donate=False)
    imgs, boxes, labels = synthetic_batch(jax.random.PRNGKey(1), 2, hw, 5, max_boxes=8)
    losses = []
    for _ in range(4):
        state, metrics = step(state, imgs, boxes, labels)
        losses.append(float(metrics["total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_shard_map_step_matches_jit_sharding_step():
    """Explicit-collective (shard_map + pmean) step == jit+NamedSharding step
    when every shard sees identical data (uniform num_pos makes the DDP
    local-normalization and the global normalization coincide). Exercises
    parallel/collectives on a live path (VERDICT r1 #7)."""
    import numpy as np

    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.parallel.mesh import create_mesh, replicate_state, shard_batch
    from pytorch_object_detection_tpu.train.trainer import (
        create_train_state,
        make_shard_map_train_step,
        make_train_step,
    )

    hw = (128, 128)
    strides = [8, 16, 32, 64, 128]
    shapes = [(hw[0] // s, hw[1] // s) for s in strides]
    ranges = [(-1, 32), (32, 96), (96, 192), (192, 384), (384, 9999999)]
    model = HISFCOS(num_classes=20, features=64)
    mesh = create_mesh(jax.devices()[:8])

    # identical sample replicated onto every shard
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, *hw, 3))
    boxes = jnp.tile(jnp.array([[[10.0, 10.0, 80.0, 90.0], [-1.0] * 4]]), (1, 1, 1))
    labels = jnp.array([[3, -1]], jnp.int32)
    images8 = jnp.tile(img, (8, 1, 1, 1))
    boxes8 = jnp.tile(boxes, (8, 1, 1))
    labels8 = jnp.tile(labels, (8, 1))

    def fresh_state():
        return create_train_state(model, jax.random.PRNGKey(1), (1, *hw, 3), {"lr": 1e-2})

    step_auto = make_train_step(model, shapes, strides, ranges, compute_dtype=jnp.float32, donate=False)
    step_smap = make_shard_map_train_step(model, shapes, strides, ranges, mesh, compute_dtype=jnp.float32)

    with mesh:
        s_auto = replicate_state(mesh, fresh_state())
        b = shard_batch(mesh, (images8, boxes8, labels8))
        s_auto, m_auto = step_auto(s_auto, *b)
        s_smap = replicate_state(mesh, fresh_state())
        s_smap, m_smap = step_smap(s_smap, *b)

    np.testing.assert_allclose(float(m_auto["total"]), float(m_smap["total"]), rtol=1e-5)
    a_leaves = jax.tree_util.tree_leaves(s_auto.params)
    b_leaves = jax.tree_util.tree_leaves(s_smap.params)
    for la, lb in zip(a_leaves, b_leaves):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-5, atol=2e-6)


def test_shard_map_step_syncbn_averages_stats():
    """bn_train=True under shard_map: BN stats are identical on all replicas
    after the step (SyncBatchNorm contract) and finite."""
    import numpy as np

    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.parallel.mesh import create_mesh, replicate_state, shard_batch
    from pytorch_object_detection_tpu.train.trainer import create_train_state, make_shard_map_train_step

    hw = (128, 128)
    strides = [8, 16, 32, 64, 128]
    shapes = [(hw[0] // s, hw[1] // s) for s in strides]
    ranges = [(-1, 32), (32, 96), (96, 192), (192, 384), (384, 9999999)]
    model = HISFCOS(num_classes=20, features=64, freeze_bn=False)
    mesh = create_mesh(jax.devices()[:8])
    state = create_train_state(model, jax.random.PRNGKey(1), (1, *hw, 3), {"lr": 1e-2}, freeze_bn=False)
    step = make_shard_map_train_step(
        model, shapes, strides, ranges, mesh, compute_dtype=jnp.float32, bn_train=True
    )
    # different data per shard -> per-shard stats differ pre-sync
    images = jax.random.uniform(jax.random.PRNGKey(2), (8, *hw, 3))
    boxes = jnp.tile(jnp.array([[[10.0, 10.0, 80.0, 90.0], [-1.0] * 4]]), (8, 1, 1))
    labels = jnp.tile(jnp.array([[3, -1]], jnp.int32), (8, 1))
    with mesh:
        state = replicate_state(mesh, state)
        b = shard_batch(mesh, (images, boxes, labels))
        new_state, metrics = step(state, *b)
    assert np.isfinite(float(metrics["total"]))
    # replicated output => stats identical across devices; check single-shard
    leaf = jax.tree_util.tree_leaves(new_state.batch_stats)[0]
    arrs = [np.asarray(s.data) for s in leaf.addressable_shards]
    for a in arrs[1:]:
        np.testing.assert_array_equal(arrs[0], a)


def test_scan_step_equals_k_single_steps():
    """make_train_step_scan: K scanned steps == K sequential single steps
    (same math; tolerances cover XLA fusion-order drift between the two
    compilations) — PERF.md r4."""
    from pytorch_object_detection_tpu.train.trainer import make_train_step_scan

    model, state0 = _small_state()
    single = make_train_step(model, SHAPES, STRIDES, RANGES, "giou",
                             compute_dtype=jnp.float32, donate=False)
    scan = make_train_step_scan(model, SHAPES, STRIDES, RANGES, "giou",
                                compute_dtype=jnp.float32)
    K = 2
    batches = [synthetic_batch(jax.random.PRNGKey(10 + k), 2, HW, 5, max_boxes=8)
               for k in range(K)]

    s_ref = state0
    ref_totals = []
    for imgs, boxes, labels in batches:
        s_ref, m = single(s_ref, imgs, boxes, labels)
        ref_totals.append(float(m["total"]))

    stk = lambda i: jnp.stack([b[i] for b in batches])
    _, state0b = _small_state()  # fresh (scan donates its carry)
    s_scan, metrics = scan(state0b, stk(0), stk(1), stk(2))
    np.testing.assert_allclose(np.asarray(metrics["total"]), ref_totals, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_grad_barrier_matches_reference_freeze():
    """frozen_stages=1 with the gradient barrier: frozen grads are exactly
    zero, trainable grads identical to the barrier-free model."""
    model_a, state_a = _small_state()
    model_b = HISFCOS(num_classes=5, features=64, frozen_stages=1)
    state_b = create_train_state(
        model_b, jax.random.PRNGKey(0), (1, *HW, 3),
        {"lr": 1e-2, "warmup_steps": 10}, freeze_bn=True, frozen_stages=1,
    )
    step_a = make_train_step(model_a, SHAPES, STRIDES, RANGES, "giou",
                             compute_dtype=jnp.float32, donate=False)
    step_b = make_train_step(model_b, SHAPES, STRIDES, RANGES, "giou",
                             compute_dtype=jnp.float32, donate=False)
    imgs, boxes, labels = synthetic_batch(jax.random.PRNGKey(1), 2, HW, 5, max_boxes=8)
    sa, ma = step_a(state_a, imgs, boxes, labels)
    sb, mb = step_b(state_b, imgs, boxes, labels)
    np.testing.assert_allclose(float(ma["total"]), float(mb["total"]), rtol=1e-6)
    # every post-step param equal: frozen leaves never move in either
    # (optimizer mask), trainable leaves get identical gradients
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
