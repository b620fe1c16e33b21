"""Native (C++) host-runtime components, loaded via ctypes.

Build once with ``python -m pytorch_object_detection_tpu.native.build``;
every consumer falls back to the pure-numpy implementation when the shared
library is absent, so the native path is an accelerator, not a dependency.
"""
from pytorch_object_detection_tpu.native.lib import get_lib, native_available  # noqa: F401
