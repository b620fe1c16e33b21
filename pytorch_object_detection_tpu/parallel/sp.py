"""Spatial partitioning: shard the image HEIGHT over the mesh's ``model`` axis.

The detection analogue of sequence parallelism.  Data parallelism stops
helping when the per-chip batch hits 1; spatial partitioning keeps scaling
by splitting each image's rows across chips — the classic TPU recipe for
huge-canvas detection/segmentation (one conv's halo is a thin row band, so
the exchanged bytes are tiny next to the activations saved).

TPU-native mechanics: annotate the batch as ``P('data', 'model')`` on
``[B, H, W, C]`` and leave the params replicated; GSPMD partitions every
conv spatially and inserts the halo exchanges (collective-permutes of the
kernel-overlap rows) plus whatever gathers the FPN top-down resizes and the
loss reductions need.  No model or trainer changes — the same jitted step
consumes the committed shardings.  SPMD is semantics-preserving;
`tests/test_sp.py` asserts a dp*sp step equals the single-device step.

The ``model`` axis thus carries whichever layout the run picks: parameter
sharding (parallel/tp.py) or spatial sharding (this module).  The reference
framework has neither (DDP only, `/root/reference/train.py:43-58`).

Activation memory per chip scales ~1/sp for the backbone trunk (where the
big activations live); the deep FPN/head levels (H < sp * a few rows) are
where XLA falls back to gathers — acceptable because they are a small
fraction of the pixels.
"""
from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_object_detection_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] images: batch over 'data', rows over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def shard_batch_spatial(mesh: Mesh, images, *aux):
    """Place (images, boxes, labels, ...) onto the mesh with images
    spatially partitioned; the per-image aux tensors shard on batch only."""
    import jax

    img = jax.device_put(images, spatial_image_sharding(mesh))
    rest = tuple(
        jax.device_put(a, NamedSharding(mesh, P(DATA_AXIS))) for a in aux
    )
    return (img,) + rest
