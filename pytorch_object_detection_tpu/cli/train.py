#!/usr/bin/env python
"""Config-driven trainer (replaces the reference's train.py / train_new.py).

    python scripts/train.py --config config/main.yaml [--steps N] [--synthetic]

One fused jitted train step; data parallel over all visible devices via the
mesh; TensorBoard metrics on process 0; orbax checkpoints every epoch (full
state — true resume, which the reference lacks).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax

if __import__("os").environ.get("PODT_FORCE_CPU"):
    # test hook: the axon plugin ignores JAX_PLATFORMS, force via config.
    # A value > 1 also sets the simulated CPU device count (multi-device
    # layout tests: dp/tp/sp through the CLI)
    jax.config.update("jax_platforms", "cpu")
    _n = __import__("os").environ["PODT_FORCE_CPU"]
    if _n.isdigit() and int(_n) > 1:
        jax.config.update("jax_num_cpu_devices", int(_n))
import jax.numpy as jnp
import numpy as np


def build_dataset(cfg, train: bool = True, cache_decoded: bool = False):
    from pytorch_object_detection_tpu.core.config import canvas_hw
    from pytorch_object_detection_tpu.data.augment import HostAugment

    canvas = canvas_hw(cfg)
    ds_cfg = cfg["dataset_setting"]
    augment = HostAugment() if train else None
    if cfg["model"]["dataset"] == "VOC":
        from pytorch_object_detection_tpu.data.voc import VOCDataset

        if train:
            roots = [p for p in (ds_cfg.get("train_07"), ds_cfg.get("train_12")) if p]
            return VOCDataset(roots, ds_cfg.get("type", "trainval"), canvas,
                              augment=augment, cache_decoded=cache_decoded)
        return VOCDataset([ds_cfg.get("test_07", ds_cfg.get("train_07"))], "test", canvas)
    else:
        from pytorch_object_detection_tpu.data.coco import COCODataset

        if train:
            return COCODataset(ds_cfg["TrainData"], ds_cfg["TrainAnnotation"], canvas, augment=augment)
        return COCODataset(ds_cfg["ValData"], ds_cfg["ValAnnotation"], canvas, filter_empty=False)


def _run_eval(cfg, model, state) -> float:
    """Mid-training evaluation on the configured test split; returns mAP."""
    from pytorch_object_detection_tpu.core import config as C
    from pytorch_object_detection_tpu.eval.evaluator import evaluate_coco, evaluate_voc

    dataset = build_dataset(cfg, train=False)
    strides = (C.strides(cfg) if "stride" in C.model_block(cfg)
               else (8, 16, 32, 64, 128))  # unused by anchor-codec pipelines
    if cfg["model"]["dataset"] == "VOC":
        result = evaluate_voc(
            model, state.params, state.batch_stats, dataset,
            strides=strides, num_classes=C.num_classes(cfg), verbose=False,
        )
        return float(result["mAP"])
    result = evaluate_coco(model, state.params, state.batch_stats, dataset,
                           strides=strides, verbose=False)
    return float(result["AP"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/main.yaml")
    ap.add_argument("--steps", type=int, default=0, help="stop after N steps (0 = full epochs)")
    ap.add_argument("--synthetic", action="store_true", help="train on synthetic data (no dataset needed)")
    ap.add_argument("--checkpoint-dir", default="./checkpoint")
    ap.add_argument("--resume", default="", help="checkpoint dir/path to resume from")
    ap.add_argument("--pretrained-backbone", default="", help="torchvision resnet50 .pth to graft")
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="run VOC/COCO eval every N epochs (0 = off); tracks best mAP")
    ap.add_argument("--ckpt-every", type=int, default=1,
                    help="save the rolling checkpoint every N epochs (preemption "
                         "checkpoints are always written). On short epochs the "
                         "per-epoch orbax save dominates wall time — raise this "
                         "for small-dataset convergence runs")
    ap.add_argument("--cache-decoded", action="store_true",
                    help="cache decoded images in memory across epochs (small "
                         "datasets; augmentation still randomizes per epoch)")
    ap.add_argument("--ring-loader", action="store_true",
                    help="batched-native host loader (data/pipeline."
                         "RingTileLoader): one Python call per batch, "
                         "preallocated ring, C++ thread-pool JPEG decode "
                         "straight into raw tiles; the aspect-preserving "
                         "resize joins the device program.  Removes the "
                         "per-image-Python loader ceiling (PERF.md r5).  "
                         "Host color-jitter/rotate/crop augments are "
                         "replaced by the device jitter+flip (VOC only)")
    ap.add_argument("--nan-check-every", type=int, default=1,
                    help="fetch the pipelined loss scalar every N steps. Each fetch "
                         "is a host roundtrip (~24 ms on the axon tunnel) that paces "
                         "the loop; N>1 trades NaN-halt latency for throughput")
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="size of the mesh's 'model' axis (devices per "
                         "model-parallel group); data axis gets the rest")
    ap.add_argument("--layout", default="tp", choices=("tp", "sp"),
                    help="what the 'model' axis carries when "
                         "--model-parallel > 1: tp = tensor parallelism "
                         "(parallel/tp.py, params+optimizer channel-sharded), "
                         "sp = spatial partitioning (parallel/sp.py, image "
                         "rows sharded; params replicated)")
    ap.add_argument("--swa", action="store_true",
                    help="stochastic weight averaging: keep a running average "
                         "of params (train/swa.py) and save it as "
                         "<savename>_swa at the end (the reference's dead "
                         "swa_enabled flag, made real)")
    ap.add_argument("--swa-start-step", type=int, default=0,
                    help="step to start averaging (and to drop to --swa-lr)")
    ap.add_argument("--swa-every", type=int, default=0,
                    help="also average every N steps (0 = at epoch ends only)")
    ap.add_argument("--swa-decay", type=float, default=0.0,
                    help="EMA decay in (0,1); 0 = uniform average (torch "
                         "AveragedModel default)")
    ap.add_argument("--swa-lr", type=float, default=0.0,
                    help="SWALR constant learning rate after --swa-start-step "
                         "(0 = keep the base schedule)")
    ap.add_argument("--coordinator", default="",
                    help="multi-host launch: coordinator host:port (the env:// "
                         "equivalent of the reference's torch.distributed init, "
                         "train.py:45-46). Launch one process per host with the "
                         "same --coordinator and --num-processes and a unique "
                         "--process-id; TPU pod slices that set the cluster env "
                         "need none of these (auto-detected)")
    ap.add_argument("--num-processes", type=int, default=0,
                    help="total process count for --coordinator launches")
    ap.add_argument("--process-id", type=int, default=-1,
                    help="this process's rank for --coordinator launches")
    args = ap.parse_args()

    from pytorch_object_detection_tpu.core import config as C
    from pytorch_object_detection_tpu.data.pipeline import DetectionLoader, make_device_preprocess
    from pytorch_object_detection_tpu.models.registry import build_model
    from pytorch_object_detection_tpu.parallel.mesh import create_mesh, initialize_distributed, replicate_state, shard_batch
    from pytorch_object_detection_tpu.train import checkpoints as ckpt
    from pytorch_object_detection_tpu.train.trainer import create_train_state, make_train_step
    from pytorch_object_detection_tpu.utils.metrics import MetricWriter

    if args.coordinator:
        initialize_distributed(coordinator=args.coordinator,
                               num_processes=args.num_processes or None,
                               process_id=args.process_id if args.process_id >= 0 else None)
    else:
        initialize_distributed()
    cfg = C.load_config(args.config)
    name = cfg["model"]["name"]
    block = C.model_block(cfg)
    canvas = C.canvas_hw(cfg)
    n_classes = C.num_classes(cfg)
    anchor_based = name in ("RETINANET", "SSD300")
    strides = C.strides(cfg) if "stride" in block else ()
    ranges = C.limit_ranges(cfg) if "range" in block else ()
    shapes = C.level_shapes(cfg) if "stride" in block else ()
    batch_size = int(block["batch_size"])
    compute_dtype = jnp.bfloat16 if cfg["model"].get("amp", True) else jnp.float32

    # reference trains HISFCOS with stage 1 frozen (HISFcos.py:57-68);
    # frozen_stages both masks the optimizer (create_train_state) and adds
    # the gradient barrier in the backbone so the dead backward is skipped
    frozen_stages = 1 if name == "HISFCOS" else 0
    model = build_model(name, n_classes, int(block["channel"]),
                        frozen_stages=frozen_stages)
    rng = jax.random.PRNGKey(0)
    sched = block.get("schedule", {})  # optional: warmup_steps/warmup_factor/milestones/gamma
    state = create_train_state(
        model,
        rng,
        (1, *canvas, 3),
        {
            "name": block["optimizer"]["name"],
            "lr": float(block["optimizer"]["lr"]),
            "momentum": float(block["optimizer"].get("momentum", 0.9)),
            "weight_decay": float(block["optimizer"].get("weight_decay", 1e-4)),
            "warmup_steps": int(sched.get("warmup_steps", 500)),
            "warmup_factor": float(sched.get("warmup_factor", 1.0 / 3.0)),
            "milestones": tuple(sched.get("milestones", (120000, 160000))),
            "gamma": float(sched.get("gamma", 0.1)),
            "swa_lr": args.swa_lr if args.swa else 0.0,
            "swa_start_step": args.swa_start_step,
        },
        freeze_bn=True,
        frozen_stages=frozen_stages,
    )
    if args.pretrained_backbone:
        state = ckpt.load_pretrained_backbone(state, args.pretrained_backbone)
    if args.resume:
        state = ckpt.restore_checkpoint(args.resume, state)

    if anchor_based:
        # RetinaNet/SSD ride the anchor codec train step (the reference
        # ships both without any training path — SURVEY §2.6)
        from pytorch_object_detection_tpu.train.trainer import make_anchor_train_step

        if name == "SSD300":
            from pytorch_object_detection_tpu.models.ssd import default_boxes

            anchors = default_boxes(canvas[0])
            train_step = make_anchor_train_step(
                model, anchors, n_classes, compute_dtype,
                pos_iou=float(block.get("pos_iou", 0.5)),
                neg_iou=float(block.get("neg_iou", 0.5)),
                loss="multibox")
        else:
            from pytorch_object_detection_tpu.ops.anchors import generate_anchors

            anchors = generate_anchors(model.level_shapes(canvas), strides)
            train_step = make_anchor_train_step(
                model, anchors, n_classes, compute_dtype,
                pos_iou=float(block.get("pos_iou", 0.5)),
                neg_iou=float(block.get("neg_iou", 0.4)),
                loss="focal")
    else:
        train_step = make_train_step(model, shapes, strides, ranges, block.get("criterion", "giou"), compute_dtype)
    preprocess = make_device_preprocess(train=True)
    # multi-process runs REQUIRE the global mesh: without it each rank would
    # duplicate the work and hold host-local state orbax cannot save
    mp = max(1, args.model_parallel)
    if mp > 1:
        assert jax.process_count() == 1, (
            "--model-parallel layouts are single-process (multi-host carries "
            "dp; combine via pod-slice meshes)")
    use_mesh = ((cfg["model"].get("ddp", True) or jax.process_count() > 1 or mp > 1)
                and len(jax.devices()) > 1)
    mesh = create_mesh(model_parallel=mp) if use_mesh else None
    if mesh is not None:
        if mp > 1 and args.layout == "tp":
            from pytorch_object_detection_tpu.parallel.tp import shard_state_tp

            state = shard_state_tp(mesh, state)
        else:
            state = replicate_state(mesh, state)

    writer = MetricWriter(os.path.join("runs", cfg["savename"])) if jax.process_index() == 0 else None

    if args.synthetic:
        def batches():
            # host-side numpy generation: keeps the device queue full (a
            # jax-generated batch would cost a tunnel fetch per step)
            rng_np = np.random.default_rng(0)
            imgs = rng_np.integers(0, 255, (batch_size, *canvas, 3), np.uint8)
            while True:
                n = rng_np.integers(1, 8)
                boxes = np.full((batch_size, 32, 4), -1.0, np.float32)
                labels = np.full((batch_size, 32), -1, np.int32)
                cxy = rng_np.uniform(0.1, 0.9, (batch_size, n, 2)) * np.array(canvas[::-1])
                wh = rng_np.uniform(0.05, 0.4, (batch_size, n, 2)) * np.array(canvas[::-1])
                boxes[:, :n, :2] = np.maximum(cxy - wh / 2, 0)
                boxes[:, :n, 2:] = np.minimum(cxy + wh / 2, np.array(canvas[::-1]) - 1)
                labels[:, :n] = rng_np.integers(1, n_classes + 1, (batch_size, n))
                yield (imgs, boxes, labels,
                       np.ones(batch_size, np.float32), np.full(batch_size, canvas[1], np.int32),
                       [str(i) for i in range(batch_size)])

        epochs, loader = 1, batches()
    elif args.ring_loader:
        from pytorch_object_detection_tpu.data.pipeline import (
            RingTileLoader,
            make_device_resize,
        )
        from pytorch_object_detection_tpu.data.voc import VOCDataset

        assert cfg["model"]["dataset"] == "VOC", "--ring-loader: VOC only"
        ds_cfg = cfg["dataset_setting"]
        roots = [p for p in (ds_cfg.get("train_07"), ds_cfg.get("train_12")) if p]
        dataset = VOCDataset(roots, ds_cfg.get("type", "trainval"), canvas,
                             raw_tiles=True)
        loader = RingTileLoader(
            dataset, batch_size,
            max_boxes=int(ds_cfg.get("max_boxes", 64)),
            decode_threads=int(ds_cfg.get("num_workers", 0)),
        )
        ring_resize = make_device_resize(canvas)
        epochs = int(block["Epoch"])
    else:
        dataset = build_dataset(cfg, train=True, cache_decoded=args.cache_decoded)
        loader = DetectionLoader(
            dataset, batch_size, max_boxes=int(cfg["dataset_setting"].get("max_boxes", 64)),
            num_workers=int(cfg["dataset_setting"].get("num_workers", 8)),
        )
        epochs = int(block["Epoch"])

    step_count = int(state.step)
    t0 = time.perf_counter()
    done = False
    prev_total = None
    best_map = -1.0

    swa_state = None
    if args.swa:
        from pytorch_object_detection_tpu.train.swa import swa_init, swa_update

        swa_state = swa_init(state.params)
        swa_decay = args.swa_decay if args.swa_decay > 0 else None

    # preemption handling: SIGTERM/SIGINT checkpoint-and-exit (the reference's
    # commented train_interupter hook, train.py:144-146, made real — combined
    # with orbax full-state restore this gives true preemption recovery)
    import signal

    interrupted = {"flag": False}

    def _on_signal(signum, _frame):
        interrupted["flag"] = True
        print(f"signal {signum}: checkpointing and exiting after this step", flush=True)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    for epoch in range(epochs):
        epoch_iter = loader if args.synthetic else iter(loader)
        for batch in epoch_iter:
            images_u8, boxes, labels, _scales, content_w = batch[:5]
            rng, k = jax.random.split(rng)
            if args.ring_loader:
                # raw tiles: device-side aspect-preserving resize first
                # (boxes are already host-scaled to canvas coordinates)
                src_hw = np.stack([batch.content_h, batch.content_w], 1).astype(np.int32)
                canvas_u8, _s, content_hw = ring_resize(
                    jnp.asarray(images_u8), jnp.asarray(src_hw))
                imgs, bxs = preprocess(k, canvas_u8, jnp.asarray(boxes),
                                       content_hw[:, 1])
            else:
                imgs, bxs = preprocess(k, jnp.asarray(images_u8), jnp.asarray(boxes), jnp.asarray(content_w))
            if mesh is not None:
                if mp > 1 and args.layout == "sp":
                    from pytorch_object_detection_tpu.parallel.sp import (
                        shard_batch_spatial,
                    )

                    imgs, bxs, lbls = shard_batch_spatial(
                        mesh, imgs, bxs, jnp.asarray(labels))
                else:
                    imgs, bxs, lbls = shard_batch(mesh, (imgs, bxs, jnp.asarray(labels)))
            else:
                lbls = jnp.asarray(labels)
            state, metrics = train_step(state, imgs, bxs, lbls)
            step_count += 1
            if (args.swa and args.swa_every and step_count >= args.swa_start_step
                    and step_count % args.swa_every == 0):
                swa_state = swa_update(swa_state, state.params, swa_decay)
            # NaN guard, pipelined one step behind: fetch the PREVIOUS
            # step's total while this one runs (no device stall).  The
            # fetch itself is a tunnel roundtrip, so its cadence is a flag.
            if (prev_total is not None and step_count % args.nan_check_every == 0
                    and not np.isfinite(float(prev_total))):
                print(f"NON-FINITE loss at step {step_count - 1} — stopping", flush=True)
                done = True
                break
            prev_total = metrics["total"]
            if step_count % args.log_every == 0:
                m = {k2: float(v) for k2, v in metrics.items()}
                if not np.isfinite(m["total"]):  # same-step check at log points
                    print(f"NON-FINITE loss at step {step_count}: {m} — stopping", flush=True)
                    done = True
                    break
                rate = args.log_every * batch_size / (time.perf_counter() - t0)
                t0 = time.perf_counter()
                if writer:
                    writer.write(step_count, {**m, "images_per_sec": rate})
                print(f"step {step_count} epoch {epoch}: " +
                      " ".join(f"{k2}={v:.4f}" for k2, v in m.items()) +
                      f" ({rate:.1f} img/s)", flush=True)
            if interrupted["flag"] or (args.steps and step_count >= args.steps):
                done = True
                if interrupted["flag"]:
                    # orbax save is a COLLECTIVE in a multi-process runtime
                    # (internal broadcast/allgather) — every process must
                    # call it, on a SHARED --checkpoint-dir; orbax elects
                    # the writers. Gating on process 0 deadlocks gloo/ICI.
                    ckpt.save_checkpoint(os.path.join(args.checkpoint_dir, cfg["savename"]), state)
                break
        if args.swa and not args.swa_every and step_count >= args.swa_start_step:
            swa_state = swa_update(swa_state, state.params, swa_decay)
        if (not args.synthetic
                and ((epoch + 1) % args.ckpt_every == 0 or done or epoch + 1 == epochs)):
            ckpt.save_checkpoint(os.path.join(args.checkpoint_dir, cfg["savename"]), state)
        if (
            args.eval_every
            and not args.synthetic
            and (epoch + 1) % args.eval_every == 0
            and jax.process_index() == 0
        ):
            mAP = _run_eval(cfg, model, state)
            if writer:
                writer.write(step_count, {"mAP": mAP})
            if mAP > best_map:
                best_map = mAP
                ckpt.save_checkpoint(
                    os.path.join(args.checkpoint_dir, cfg["savename"] + "_best"), state, keep=1
                )
                print(f"new best mAP {mAP:.4f} at epoch {epoch}", flush=True)
        if done:
            break
    ckpt.save_checkpoint(os.path.join(args.checkpoint_dir, cfg["savename"]), state)
    if args.swa and int(swa_state.count) > 0:
        # averaged weights as a separate run (backbone BN is frozen, so no
        # BN re-estimation pass is needed — stats never moved)
        ckpt.save_checkpoint(
            os.path.join(args.checkpoint_dir, cfg["savename"] + "_swa"),
            state.replace(params=swa_state.params), keep=1)
        print(f"swa: averaged {int(swa_state.count)} snapshots")
    print("training done: step", step_count)


if __name__ == "__main__":
    main()
