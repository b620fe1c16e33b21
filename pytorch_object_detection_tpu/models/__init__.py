from pytorch_object_detection_tpu.models.registry import build_model  # noqa: F401
