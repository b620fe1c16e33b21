"""Build the native shared library (g++; links the system libjpeg).

    python -m pytorch_object_detection_tpu.native.build
"""
from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["detection_ops.cpp", "jpeg_loader.cpp"]
LIB_NAME = "libdetops.so"


def build(verbose: bool = True) -> str:
    out = os.path.join(_DIR, LIB_NAME)
    srcs = [os.path.join(_DIR, s) for s in SOURCES]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *srcs, "-o", out, "-ljpeg", "-lpthread",
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print("built", path)
    sys.exit(0)
