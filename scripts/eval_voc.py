#!/usr/bin/env python
"""Shim: the real program lives at pytorch_object_detection_tpu/cli/eval_voc.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_object_detection_tpu.cli.eval_voc import main

if __name__ == "__main__":
    main()
