"""Functional training core: TrainState + one fused jitted train step.

Replaces the reference's eager loop (`/root/reference/train_new.py:181-245`)
with a single pure ``train_step(state, batch) -> (state, metrics)`` compiled
once by XLA:

  * forward + target assignment + loss + backward + SGD update fuse into one
    TPU program — no per-op dispatch, no host syncs in the hot loop;
  * mixed precision is a bf16 cast policy at apply time (params master fp32),
    replacing CUDA AMP + GradScaler (bf16 needs no loss scaling);
  * BN freezing / backbone stage freezing (reference HISFcos.py:57-68,
    resnet50.py:55-65) are optimizer masks over param paths, and frozen BN
    runs off stored `batch_stats`;
  * data parallelism: run the same step under a Mesh with the batch sharded
    on the ``data`` axis (parallel/mesh.py) — XLA inserts the grad psum.

Optimizers: SGD/momentum (torch-ordering: wd before momentum), Adam, AdamW,
RAdam — the set `bulider.py:28-43` exposes.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pytorch_object_detection_tpu.ops.losses import fcos_loss, flatten_level_preds
from pytorch_object_detection_tpu.ops.targets import generate_targets
from pytorch_object_detection_tpu.train.schedules import warmup_step_decay


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
        )


# ---------------------------------------------------------------------------
# parameter freezing masks
# ---------------------------------------------------------------------------
def param_labels(params, freeze_bn: bool = True, frozen_stages: int = 0) -> Any:
    """Label each param 'train' or 'freeze'.

    freeze_bn: all BatchNorm scale/bias (module name 'bn*') — the reference
    sets requires_grad=False on every BN when bn_freeze (its only config).
    frozen_stages=k: backbone stem + layer1..layerk (reference
    freeze_stages, resnet50.py:55-65).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        if freeze_bn and any(k == "bn" or k.startswith("bn") for k in keys):
            return "freeze"
        if frozen_stages >= 0 and len(keys) >= 2 and keys[0] == "backbone":
            mod = keys[1]
            if mod in ("conv1", "bn1"):
                return "freeze"
            for s in range(1, frozen_stages + 1):
                if mod.startswith(f"layer{s}_"):
                    return "freeze"
        return "train"

    labels = {tuple(p for p in path): label(path) for path, _ in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [labels[tuple(p for p in path)] for path, _ in flat]
    )


def make_optimizer(
    name: str = "SGD",
    lr: float | Callable = 1e-2,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    params=None,
    freeze_bn: bool = True,
    frozen_stages: int = 0,
) -> optax.GradientTransformation:
    """Build the configured optimizer with freezing masks (bulider.py:28-43)."""
    name = name.upper()
    if name == "SGD":
        # torch SGD ordering: grad += wd*p, then momentum trace, then -lr
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_learning_rate(lr),
        )
    elif name == "ADAM":
        tx = optax.adam(lr)
    elif name == "ADAMW":
        tx = optax.adamw(lr, weight_decay=weight_decay)
    elif name == "RADAM":
        tx = optax.radam(lr)
    else:
        raise NotImplementedError(f"optimizer {name}")
    if params is not None and (freeze_bn or frozen_stages > 0):
        labels = param_labels(params, freeze_bn, frozen_stages)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


# ---------------------------------------------------------------------------
# train / eval steps
# ---------------------------------------------------------------------------
def create_train_state(
    model,
    rng,
    input_shape: Tuple[int, int, int, int],
    optimizer_cfg: Optional[Dict] = None,
    freeze_bn: bool = True,
    frozen_stages: int = 1,
) -> TrainState:
    # jit the init: un-jitted linen init dispatches op-by-op (minutes through
    # the axon tunnel); jitted it is one compiled program (~seconds)
    variables = jax.jit(lambda r, x: model.init(r, x, False))(
        rng, jnp.zeros(input_shape, jnp.float32)
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    cfg = optimizer_cfg or {}
    schedule = warmup_step_decay(
        cfg.get("lr", 1e-2),
        cfg.get("warmup_steps", 500),
        cfg.get("warmup_factor", 1.0 / 3.0),
        cfg.get("milestones", (120000, 160000)),
        cfg.get("gamma", 0.1),
    )
    if cfg.get("swa_lr"):
        # SWALR: constant LR once averaging starts (train/swa.py; the
        # reference's dead swa flag, /root/reference/train.py:13,201-206)
        base, swa_v = schedule, float(cfg["swa_lr"])
        start = int(cfg.get("swa_start_step", 0))
        schedule = lambda step: jnp.where(
            jnp.asarray(step) < start, base(step), swa_v)
    tx = make_optimizer(
        cfg.get("name", "SGD"),
        schedule,
        cfg.get("momentum", 0.9),
        cfg.get("weight_decay", 1e-4),
        params=params,
        freeze_bn=freeze_bn,
        frozen_stages=frozen_stages,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def make_train_step(
    model,
    level_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    limit_ranges: Sequence[Tuple[float, float]],
    reg_mode: str = "giou",
    compute_dtype: jnp.dtype = jnp.bfloat16,
    bn_train: bool = False,
    donate: bool = True,
    remat: bool = False,
    cnt_mode: str = "bce",
):
    """Build the fused jitted train step.

    The returned fn is ``(state, images[B,H,W,3], boxes[B,M,4], labels[B,M])
    -> (state, metrics)`` and works unchanged on one chip or under a Mesh
    with the batch sharded over 'data' (grads come out replicated; XLA
    inserts the psum).  ``remat=True`` rematerializes the forward in the
    backward pass (jax.checkpoint): trades ~1/3 more FLOPs for activation
    memory, enabling much larger per-chip batches.
    """

    def apply_model(apply_vars, images, mutable):
        return model.apply(apply_vars, images, True, mutable=mutable)

    if remat:
        apply_model = jax.checkpoint(apply_model, static_argnums=(2,))

    def step_fn(state: TrainState, images, boxes, labels):
        def loss_fn(params):
            apply_vars = {"params": _cast_tree(params, compute_dtype)}
            if state.batch_stats:
                apply_vars["batch_stats"] = _cast_tree(state.batch_stats, compute_dtype)
            mutable = ["batch_stats"] if bn_train else False
            out = apply_model(apply_vars, images.astype(compute_dtype), mutable)
            if bn_train:
                (cls_l, cnt_l, reg_l), updates = out
                new_stats = _cast_tree(updates["batch_stats"], jnp.float32)
            else:
                cls_l, cnt_l, reg_l = out
                new_stats = None
            cls_p = flatten_level_preds([c.astype(jnp.float32) for c in cls_l])
            cnt_p = flatten_level_preds([c.astype(jnp.float32) for c in cnt_l])
            reg_p = flatten_level_preds([r.astype(jnp.float32) for r in reg_l])
            tgt = generate_targets(level_shapes, strides, limit_ranges, boxes, labels)
            losses = fcos_loss(
                cls_p, cnt_p, reg_p, tgt.cls, tgt.cnt, tgt.reg, reg_mode, cnt_mode
            )
            return losses["total"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = _cast_tree(grads, jnp.float32)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics = {k: v for k, v in losses.items()}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_train_step_scan(
    model,
    level_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    limit_ranges: Sequence[Tuple[float, float]],
    reg_mode: str = "giou",
    compute_dtype: jnp.dtype = jnp.bfloat16,
    bn_train: bool = False,
    remat: bool = False,
    cnt_mode: str = "bce",
):
    """K train steps per dispatch: ``(state, images[K,B,...], boxes[K,B,M,4],
    labels[K,B,M]) -> (state, metrics[K])`` via ``lax.scan``.

    Numerically identical to K calls of :func:`make_train_step`'s fn; the
    point is wall-clock: every host->device dispatch of the single-step
    program pays the dispatch/tunnel latency (PERF.md r3: 32.2 ms wall vs
    29.4 ms device at B=16 — ~9%), and scanning K steps inside one program
    pays it once per K.  The reference has no analogue (its Python loop
    pays per-step launch + sync, train_new.py:181-245).
    """
    single = make_train_step(
        model, level_shapes, strides, limit_ranges, reg_mode, compute_dtype,
        bn_train, donate=False, remat=remat, cnt_mode=cnt_mode,
    ).__wrapped__  # the traced body; scan needs it inline, un-jitted

    def steps_fn(state: TrainState, images, boxes, labels):
        def body(carry, batch):
            new_state, metrics = single(carry, *batch)
            return new_state, metrics

        return jax.lax.scan(body, state, (images, boxes, labels))

    return jax.jit(steps_fn, donate_argnums=(0,))


def make_shard_map_train_step(
    model,
    level_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    limit_ranges: Sequence[Tuple[float, float]],
    mesh,
    reg_mode: str = "giou",
    compute_dtype: jnp.dtype = jnp.bfloat16,
    bn_train: bool = False,
    cnt_mode: str = "bce",
):
    """Explicit-SPMD train step via `jax.shard_map` + manual collectives.

    Semantics match the reference's DDP exactly (`train.py:101-103,184-190`):
    each replica computes its shard's loss normalized by its LOCAL positive
    count, gradients are averaged with an explicit pmean (DDP all-reduce),
    metrics are pmean'd (the all_gather + host-mean of per-rank losses), and
    with ``bn_train=True`` updated BN statistics are cross-replica averaged
    (SyncBatchNorm, train.py:103) via parallel/collectives.sync_batch_stats.

    The jit+NamedSharding step (make_train_step) instead normalizes by the
    GLOBAL positive count — a deliberate improvement; this variant exists
    for bit-level DDP parity and as the explicit-collective seam.
    """
    from jax.sharding import PartitionSpec as P

    from pytorch_object_detection_tpu.parallel.collectives import (
        pmean_grads,
        pmean_metrics,
        sync_batch_stats,
    )
    from pytorch_object_detection_tpu.parallel.mesh import DATA_AXIS

    def sync_stats_tree(stats):
        def walk(node):
            if isinstance(node, dict) and "mean" in node and "var" in node:
                m, v = sync_batch_stats(node["mean"], node["var"], DATA_AXIS)
                return {**node, "mean": m, "var": v}
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return node

        return walk(stats)

    def per_shard(state: TrainState, images, boxes, labels):
        def loss_fn(params):
            apply_vars = {"params": _cast_tree(params, compute_dtype)}
            if state.batch_stats:
                apply_vars["batch_stats"] = _cast_tree(state.batch_stats, compute_dtype)
            mutable = ["batch_stats"] if bn_train else False
            out = model.apply(apply_vars, images.astype(compute_dtype), True, mutable=mutable)
            if bn_train:
                (cls_l, cnt_l, reg_l), updates = out
                new_stats = _cast_tree(updates["batch_stats"], jnp.float32)
            else:
                cls_l, cnt_l, reg_l = out
                new_stats = None
            cls_p = flatten_level_preds([c.astype(jnp.float32) for c in cls_l])
            cnt_p = flatten_level_preds([c.astype(jnp.float32) for c in cnt_l])
            reg_p = flatten_level_preds([r.astype(jnp.float32) for r in reg_l])
            tgt = generate_targets(level_shapes, strides, limit_ranges, boxes, labels)
            losses = fcos_loss(
                cls_p, cnt_p, reg_p, tgt.cls, tgt.cnt, tgt.reg, reg_mode, cnt_mode
            )
            return losses["total"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = pmean_grads(_cast_tree(grads, jnp.float32))  # DDP all-reduce
        if new_stats is not None:
            new_stats = sync_stats_tree(new_stats)  # SyncBatchNorm
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics = pmean_metrics(losses)  # rank-mean of per-rank losses
        return new_state, metrics

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_anchor_train_step(
    model,
    anchors,
    num_classes: int,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    pos_iou: float = 0.5,
    neg_iou: float = 0.4,
    donate: bool = True,
    loss: str = "focal",
):
    """Fused train step for anchor-based detectors (RetinaNet/SSD layout).

    The reference ships RetinaNet and SSD without any training path
    (SURVEY §2.6 'scaffold only'); this completes both:

      * ``loss='focal'`` — RetinaNet: 0.5/0.4 matching with ignore band,
        sigmoid focal + smooth-L1(1/9).
      * ``loss='multibox'`` — SSD: 0.5/0.5 matching (pass
        ``neg_iou=pos_iou``), softmax CE with 3:1 hard-negative mining +
        smooth-L1(1); cls logits ``[B,N,1+C]`` with background class 0.

    Model must return ``(loc_preds [B,N,4], cls_logits [B,N,C])``.
    """
    from pytorch_object_detection_tpu.ops.anchors import (
        encode_targets,
        multibox_loss,
        retinanet_loss,
    )

    def step_fn(state: TrainState, images, boxes, labels):
        def loss_fn(params):
            apply_vars = {"params": _cast_tree(params, compute_dtype)}
            if state.batch_stats:
                apply_vars["batch_stats"] = _cast_tree(state.batch_stats, compute_dtype)
            loc, cls = model.apply(apply_vars, images.astype(compute_dtype), True)
            loc_t, cls_t = encode_targets(anchors, boxes, labels, pos_iou, neg_iou)
            if loss == "multibox":
                losses = multibox_loss(
                    cls.astype(jnp.float32), loc.astype(jnp.float32), cls_t, loc_t
                )
            else:
                losses = retinanet_loss(
                    cls.astype(jnp.float32), loc.astype(jnp.float32), cls_t, loc_t, num_classes
                )
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = _cast_tree(grads, jnp.float32)
        new_state = state.apply_gradients(grads)
        return new_state, losses

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def quantize_backbone(model, variables, calib_images, compute_dtype=jnp.bfloat16,
                      mean=None, std=None):
    """PTQ the backbone of a FCOS-family detector (ResNet-50 or
    EfficientNet-B0 — dispatched on ``model.backbone``).

    Calibrates activation scales on ``calib_images`` (a representative
    NORMALIZED batch) and returns the int8 qtree for
    :func:`make_eval_forward_int8`.  ``mean``/``std`` (the input-normalize
    constants; ImageNet defaults) enable the exact uint8 s2d stem path
    (ResNet only).
    """
    from pytorch_object_detection_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    if getattr(model, "backbone", "resnet50").startswith("efficientnet"):
        from pytorch_object_detection_tpu.nn.efficientnet_int8 import (
            calibrate_efficientnet,
            quantize_efficientnet,
        )

        taps = jax.jit(calibrate_efficientnet)(bb_vars, calib_images)
        taps = {k: float(v) for k, v in jax.device_get(taps).items()}
        return quantize_efficientnet(bb_vars, taps)
    from pytorch_object_detection_tpu.nn.resnet_int8 import (
        calibrate_resnet50,
        quantize_resnet50,
    )

    mean = jnp.asarray(IMAGENET_MEAN if mean is None else mean, jnp.float32)
    std = jnp.asarray(IMAGENET_STD if std is None else std, jnp.float32)
    taps = jax.jit(functools.partial(calibrate_resnet50, compute_dtype=compute_dtype))(
        bb_vars, calib_images
    )
    taps = {k: float(v) for k, v in jax.device_get(taps).items()}
    return jax.jit(functools.partial(quantize_resnet50))(bb_vars, taps, mean, std)


def _backbone_int8_feats(model, qtree_bb, images, **kw):
    """(C3..C5) int8 + scales through the model's int8 backbone ladder
    (dispatch shared by quantize_fpn / quantize_head /
    make_eval_forward_int8)."""
    if getattr(model, "backbone", "resnet50").startswith("efficientnet"):
        from pytorch_object_detection_tpu.nn.efficientnet_int8 import (
            efficientnet_int8_forward,
        )

        return efficientnet_int8_forward(qtree_bb, images, jnp.float32,
                                         dequant=False)
    from pytorch_object_detection_tpu.nn.resnet_int8 import resnet50_int8_forward

    kw.setdefault("backend", "xla")
    return resnet50_int8_forward(qtree_bb, images, jnp.float32, dequant=False,
                                 **kw)


def quantize_fpn(model, variables, qtree_bb, calib_images,
                 compute_dtype=jnp.bfloat16):
    """PTQ the FPN of a FCOS-family detector (extends
    :func:`quantize_backbone`).  Dispatches on the model: HISFCOS ->
    HisFPN ladder (nn/fpn_int8.py), classic FCOS -> classic-FPN ladder
    (models/fcos_int8.py).

    Calibrates FPN activation scales on the int8 backbone's (dequantized)
    features — the distribution the quantized FPN actually sees at serving
    time — and returns the FPN qtree for
    ``make_eval_forward_int8(..., int8_fpn=True)``.
    """
    from pytorch_object_detection_tpu.models.fcos import HISFCOS

    feats_q, scales = jax.jit(
        lambda im: _backbone_int8_feats(model, qtree_bb, im)
    )(calib_images)
    feats = tuple(q.astype(jnp.float32) * s for q, s in zip(feats_q, scales))
    if isinstance(model, HISFCOS):
        from pytorch_object_detection_tpu.nn.fpn_int8 import (
            calibrate_hisfpn,
            quantize_hisfpn,
        )

        taps = jax.jit(calibrate_hisfpn)(
            variables["params"]["fpn"], variables["batch_stats"]["fpn"], feats
        )
        taps = {k: float(v) for k, v in jax.device_get(taps).items()}
        return jax.jit(quantize_hisfpn)(
            variables["params"]["fpn"], variables["batch_stats"]["fpn"], taps, scales
        )
    from pytorch_object_detection_tpu.models.fcos import MNFCOS

    if isinstance(model, MNFCOS):
        from pytorch_object_detection_tpu.models.mnfcos_int8 import (
            calibrate_lwfpn,
            quantize_lwfpn,
        )

        taps = jax.jit(calibrate_lwfpn)(
            variables["params"]["fpn"], variables["batch_stats"]["fpn"], feats
        )
        taps = {k: float(v) for k, v in jax.device_get(taps).items()}
        return jax.jit(quantize_lwfpn)(
            variables["params"]["fpn"], variables["batch_stats"]["fpn"], taps, scales
        )
    from pytorch_object_detection_tpu.models.fcos_int8 import (
        calibrate_fpn_classic,
        quantize_fpn_classic,
    )

    taps = jax.jit(calibrate_fpn_classic)(variables["params"]["fpn"], feats)
    taps = {k: float(v) for k, v in jax.device_get(taps).items()}
    return jax.jit(quantize_fpn_classic)(
        variables["params"]["fpn"], taps, scales
    )


def quantize_head(model, variables, qtree_bb, qtree_fpn, calib_images,
                  compute_dtype=jnp.bfloat16):
    """PTQ the head (extends quantize_backbone/quantize_fpn through the
    whole detector); dispatches HISFCOS -> HISHead ladder, classic FCOS ->
    4-conv-tower ladder.  Calibrates per-level activation scales on the
    int8 FPN's (dequantized) levels and returns the head qtree for
    ``make_eval_forward_int8(..., int8_head=True)``."""
    from pytorch_object_detection_tpu.models.fcos import HISFCOS, MNFCOS

    is_his = isinstance(model, HISFCOS)
    is_mn = isinstance(model, MNFCOS)
    if is_his:
        from pytorch_object_detection_tpu.nn.fpn_int8 import hisfpn_int8_forward as fpn_fwd
    elif is_mn:
        from pytorch_object_detection_tpu.models.mnfcos_int8 import (
            lwfpn_int8_forward,
        )

        fpn_fwd = lambda qt, fq, **kw: lwfpn_int8_forward(qt, fq, **kw)
    else:
        from pytorch_object_detection_tpu.models.fcos_int8 import (
            fpn_classic_int8_forward,
        )

        fpn_fwd = lambda qt, fq, **kw: fpn_classic_int8_forward(qt, fq, **kw)

    @jax.jit
    def levels_of(images):
        feats_q, _ = _backbone_int8_feats(model, qtree_bb, images)
        lq, sc = fpn_fwd(qtree_fpn, feats_q, dequant=False)
        return tuple(q.astype(jnp.float32) * s for q, s in zip(lq, sc)), sc

    levels, level_scales = levels_of(calib_images)
    if is_his:
        from pytorch_object_detection_tpu.models.head_int8 import (
            calibrate_hishead,
            quantize_hishead,
        )

        taps = jax.jit(calibrate_hishead)(variables["params"]["head"], levels)
        taps = {k: float(v) for k, v in jax.device_get(taps).items()}
        return quantize_hishead(variables["params"]["head"], taps, level_scales,
                                model.num_classes)
    if is_mn:
        from pytorch_object_detection_tpu.models.mnfcos_int8 import (
            calibrate_mnhead,
            quantize_mnhead,
        )

        taps = jax.jit(calibrate_mnhead)(
            variables["params"]["head"], variables["batch_stats"]["head"], levels
        )
        taps = {k: float(v) for k, v in jax.device_get(taps).items()}
        return quantize_mnhead(
            variables["params"]["head"], variables["batch_stats"]["head"],
            taps, level_scales, model.num_classes,
        )
    from pytorch_object_detection_tpu.models.fcos_int8 import (
        calibrate_fcoshead,
        quantize_fcoshead,
    )

    taps = jax.jit(calibrate_fcoshead)(variables["params"]["head"], levels)
    taps = {k: float(v) for k, v in jax.device_get(taps).items()}
    return quantize_fcoshead(variables["params"]["head"], taps, level_scales,
                             model.num_classes)


def make_eval_forward_int8(model, compute_dtype: jnp.dtype = jnp.bfloat16,
                           backend: str = "pallas_block", use_pallas_gn: bool = False,
                           fused_head: bool = False, fuse_strided: bool = True,
                           int8_fpn: bool = False, int8_head: bool = False,
                           u8_input: bool = False):
    """Inference forward with an int8-PTQ backbone (serving dtype ladder:
    int8 MXU convs for the ResNet-50, bf16 FPN + head).

    Returned fn: ``(qtree, params, batch_stats, images) -> per-level fp32
    (cls, cnt, reg)`` — drop-in for :func:`make_eval_forward`'s output
    contract.  Requires a resnet50-backbone FCOS-family model.

    ``int8_fpn=True`` extends the int8 domain through the HisFPN (fused
    HisBlock Pallas kernels, nn/fpn_int8.py): ``qtree`` must then be the
    dict ``{"backbone": ..., "fpn": ...}`` from :func:`quantize_backbone`
    + :func:`quantize_fpn`, and the backbone/FPN seam stays int8 in HBM.

    ``u8_input=True``: the returned fn takes RAW uint8 images — the
    normalize affine runs folded inside the exact s2d stem kernel
    (nn/resnet_int8.quantize_stem_s2d), skipping the float normalize pass
    entirely.
    """
    from pytorch_object_detection_tpu.nn.resnet_int8 import resnet50_int8_forward
    from pytorch_object_detection_tpu.utils.gradcam import _fpn_head_for

    is_effnet = getattr(model, "backbone", "resnet50").startswith("efficientnet")
    assert not (is_effnet and u8_input), (
        "the exact uint8 stem path is ResNet-only; EfficientNet takes "
        "normalized float images"
    )
    fpn_mod, head_mod = _fpn_head_for(model)

    # use_pallas_gn default False: the GN kernel wins ~5.5 ms/iter on the
    # norm passes but XLA inserts layout copies around the custom call
    # (~6 ms) while the neighbouring convs are XLA's — net negative until
    # the head convs move into the same kernel (trace-verified).

    def fwd(qtree, params, batch_stats, images):
        from pytorch_object_detection_tpu.nn.layers import pallas_gn

        if int8_fpn:
            from pytorch_object_detection_tpu.models.fcos import HISFCOS as _HISF

            is_his = isinstance(model, _HISF)
            sub = "pallas" if backend != "xla" else "xla"
            if is_effnet:
                from pytorch_object_detection_tpu.nn.efficientnet_int8 import (
                    efficientnet_int8_forward,
                )

                feats_q, _ = efficientnet_int8_forward(
                    qtree["backbone"], images, compute_dtype, dequant=False
                )
            else:
                feats_q, _ = resnet50_int8_forward(
                    qtree["backbone"], images, compute_dtype, backend=backend,
                    fuse_strided=fuse_strided, dequant=False, u8_stem=u8_input,
                )
            from pytorch_object_detection_tpu.models.fcos import MNFCOS as _MNF

            if isinstance(model, _MNF):
                # MNFCOS ladder (models/mnfcos_int8.py; XLA int8 convs)
                from pytorch_object_detection_tpu.models.mnfcos_int8 import (
                    lwfpn_int8_forward,
                    mnhead_int8_forward,
                )

                if int8_head:
                    levels_q, _ = lwfpn_int8_forward(
                        qtree["fpn"], feats_q, dequant=False
                    )
                    return mnhead_int8_forward(qtree["head"], levels_q,
                                               num_classes=model.num_classes)
                levels = lwfpn_int8_forward(qtree["fpn"], feats_q, compute_dtype)
            elif not is_his:
                # classic FCOS ladder (models/fcos_int8.py; XLA int8 convs)
                from pytorch_object_detection_tpu.models.fcos_int8 import (
                    fcoshead_int8_forward,
                    fpn_classic_int8_forward,
                )

                if int8_head:
                    levels_q, _ = fpn_classic_int8_forward(
                        qtree["fpn"], feats_q, dequant=False
                    )
                    return fcoshead_int8_forward(qtree["head"], levels_q,
                                                 num_classes=model.num_classes)
                levels = fpn_classic_int8_forward(
                    qtree["fpn"], feats_q, compute_dtype
                )
            elif int8_head:
                from pytorch_object_detection_tpu.models.head_int8 import (
                    hishead_int8_forward,
                )
                from pytorch_object_detection_tpu.nn.fpn_int8 import (
                    hisfpn_int8_forward,
                )

                levels_q, _ = hisfpn_int8_forward(
                    qtree["fpn"], feats_q, compute_dtype, backend=sub, dequant=False
                )
                cls_l, cnt_l, reg_l = hishead_int8_forward(
                    qtree["head"], levels_q, backend=sub,
                    num_classes=model.num_classes,
                )
                return cls_l, cnt_l, reg_l
            else:
                from pytorch_object_detection_tpu.nn.fpn_int8 import (
                    hisfpn_int8_forward,
                )

                levels = hisfpn_int8_forward(
                    qtree["fpn"], feats_q, compute_dtype, backend=sub,
                )
            head_vars = {"params": _cast_tree(params["head"], compute_dtype)}
            if batch_stats and "head" in batch_stats:
                head_vars["batch_stats"] = _cast_tree(batch_stats["head"], compute_dtype)
            try:
                cls_l, cnt_l, reg_l = head_mod.apply(head_vars, levels)
            except TypeError:
                cls_l, cnt_l, reg_l = head_mod.apply(head_vars, levels, False)
            f32 = lambda xs: [x.astype(jnp.float32) for x in xs]
            return f32(cls_l), f32(cnt_l), f32(reg_l)

        if is_effnet:
            from pytorch_object_detection_tpu.nn.efficientnet_int8 import (
                efficientnet_int8_forward,
            )

            feats = efficientnet_int8_forward(qtree, images, compute_dtype)
        else:
            feats = resnet50_int8_forward(qtree, images, compute_dtype,
                                          backend=backend,
                                          fuse_strided=fuse_strided,
                                          u8_stem=u8_input)
        fpn_vars = {"params": _cast_tree(params["fpn"], compute_dtype)}
        if batch_stats and "fpn" in batch_stats:
            fpn_vars["batch_stats"] = _cast_tree(batch_stats["fpn"], compute_dtype)
        head_vars = {"params": _cast_tree(params["head"], compute_dtype)}
        if batch_stats and "head" in batch_stats:
            head_vars["batch_stats"] = _cast_tree(batch_stats["head"], compute_dtype)
        from pytorch_object_detection_tpu.models.fcos import HISFCOS as _HIS

        with pallas_gn(use_pallas_gn):
            if isinstance(model, _HIS) and batch_stats and "fpn" in batch_stats:
                # BN-folded functional HisFPN: kills the separate BN
                # scale/shift passes (~2.6 ms/iter at B=64)
                from pytorch_object_detection_tpu.nn.fused_fpn import hisfpn_folded_forward

                levels = hisfpn_folded_forward(
                    params["fpn"], batch_stats["fpn"], feats, compute_dtype
                )
            else:
                levels = fpn_mod.apply(fpn_vars, feats, False)
            from pytorch_object_detection_tpu.models.fcos import HISFCOS

            if fused_head and isinstance(model, HISFCOS) and backend != "xla":
                # whole-head Pallas kernel: one read/write per level
                from pytorch_object_detection_tpu.ops.pallas_head import (
                    hishead_level_fused,
                    hishead_params_pack,
                )

                nc = model.num_classes
                packed = hishead_params_pack(params["head"], nc)
                cls_l, cnt_l, reg_l = [], [], []
                for i, lvl in enumerate(levels):
                    out = hishead_level_fused(lvl.astype(jnp.bfloat16), packed, nc)
                    s = params["head"][f"scale{i}"]["scale"].astype(jnp.float32)
                    cls_l.append(out[..., :nc])
                    cnt_l.append(out[..., nc:nc + 1])
                    reg_l.append(jnp.exp(out[..., nc + 1:].astype(jnp.float32) * s))
            else:
                try:
                    cls_l, cnt_l, reg_l = head_mod.apply(head_vars, levels)
                except TypeError:
                    cls_l, cnt_l, reg_l = head_mod.apply(head_vars, levels, False)
        f32 = lambda xs: [x.astype(jnp.float32) for x in xs]
        return f32(cls_l), f32(cnt_l), f32(reg_l)

    return fwd


def make_eval_forward(model, compute_dtype: jnp.dtype = jnp.bfloat16):
    """Jitted inference forward returning per-level fp32 outputs."""

    def fwd(params, batch_stats, images):
        apply_vars = {"params": _cast_tree(params, compute_dtype)}
        if batch_stats:
            apply_vars["batch_stats"] = _cast_tree(batch_stats, compute_dtype)
        cls_l, cnt_l, reg_l = model.apply(apply_vars, images.astype(compute_dtype), False)
        f32 = lambda xs: [x.astype(jnp.float32) for x in xs]
        return f32(cls_l), f32(cnt_l), f32(reg_l)

    return jax.jit(fwd)
