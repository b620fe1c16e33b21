from pytorch_object_detection_tpu.nn import fpn, layers, resnet  # noqa: F401
