from pytorch_object_detection_tpu.ops import boxes, losses, nms, postprocess, targets  # noqa: F401
