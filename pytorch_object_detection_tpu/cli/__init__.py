"""Console entry points (``podt-train``, ``podt-eval-voc``, ...).

Each submodule is a full command-line program (argparse ``main()``); the
``*_main`` names below are the targets wired up in ``pyproject.toml``'s
``[project.scripts]`` table. The repo-root ``scripts/*.py`` files are thin
shims onto these so existing invocations keep working from a source checkout.

Replaces the reference's loose top-level scripts (``/root/reference/train.py``,
``test.py``, ``Test_coco.py``, ``visualization.py``) with an installable CLI.
"""
from __future__ import annotations


def train_main() -> None:
    from pytorch_object_detection_tpu.cli.train import main

    main()


def eval_voc_main() -> None:
    from pytorch_object_detection_tpu.cli.eval_voc import main

    main()


def eval_coco_main() -> None:
    from pytorch_object_detection_tpu.cli.eval_coco import main

    main()


def visualize_main() -> None:
    from pytorch_object_detection_tpu.cli.visualize import main

    main()


def model_info_main() -> None:
    from pytorch_object_detection_tpu.cli.model_info import main

    main()
