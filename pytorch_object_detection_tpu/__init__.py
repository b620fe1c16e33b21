"""TPU-native object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``hby1320/pytorch_object_detection`` (FCOS / HISFCOS / MNFCOS detectors, plus
RetinaNet / SSD scaffolding, VOC + COCO train/eval).  This is not a port: the
compute path is functional JAX (static shapes, explicit PRNG, jit/shard_map),
post-processing (decode / top-k / NMS) runs entirely on device with fixed-size
outputs, and data parallelism rides the ICI mesh via `jax.sharding`.

Layout:
    core/      config loading (YAML surface compatible with the reference)
    ops/       detection math: boxes, target assignment, losses, NMS, decode
    nn/        shared NN primitives + backbones + FPNs (flax.linen, NHWC)
    models/    detector assemblies (FCOS, HISFCOS, MNFCOS, RetinaNet, SSD)
    data/      host-side datasets + device-side fused preprocessing
    parallel/  mesh + sharding + collectives seams
    train/     jitted train step, LR schedules, checkpointing
    eval/      VOC AP and COCO mAP harnesses
    utils/     model summaries, metric writers, profiling
"""

__version__ = "0.1.0"
