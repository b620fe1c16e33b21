"""Minimal functional torch ResNet-50 forward driven directly by a
torchvision-format state dict (torch.nn.functional only, no torchvision).

Test oracle for the weight converter (train/checkpoints.py): generates real
forward-parity evidence against `nn/resnet.ResNet50` — the contract the
reference gets for free by wrapping torchvision
(`/root/reference/model/backbone/resnet50.py:9-65`).  Returns the same
(C3, C4, C5) taps.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

STAGE_SIZES = (3, 4, 6, 3)
STAGE_WIDTHS = (64, 128, 256, 512)


def make_random_state_dict(seed: int = 0) -> dict:
    """Random torchvision-resnet50-shaped state dict (numpy float32)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = (
            rng.randn(cout, cin, k, k) / np.sqrt(cin * k * k)
        ).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, (blocks, width) in enumerate(zip(STAGE_SIZES, STAGE_WIDTHS), start=1):
        cout = width * 4
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            conv(f"{src}.conv1", width, cin if b == 0 else cout, 1)
            bn(f"{src}.bn1", width)
            conv(f"{src}.conv2", width, width, 3)
            bn(f"{src}.bn2", width)
            conv(f"{src}.conv3", cout, width, 1)
            bn(f"{src}.bn3", cout)
            if b == 0:
                conv(f"{src}.downsample.0", cout, cin, 1)
                bn(f"{src}.downsample.1", cout)
        cin = cout
    return sd


def _bn(x, sd, name, eps=1e-5):
    return F.batch_norm(
        x,
        torch.as_tensor(sd[name + ".running_mean"]),
        torch.as_tensor(sd[name + ".running_var"]),
        torch.as_tensor(sd[name + ".weight"]),
        torch.as_tensor(sd[name + ".bias"]),
        training=False,
        eps=eps,
    )


def _conv(x, sd, name, stride=1, padding=0):
    return F.conv2d(x, torch.as_tensor(sd[name + ".weight"]), stride=stride, padding=padding)


@torch.no_grad()
def resnet50_forward(sd: dict, x_nchw: np.ndarray):
    """(C3, C4, C5) as numpy NCHW from a torchvision-format state dict."""
    x = torch.as_tensor(x_nchw)
    x = F.relu(_bn(_conv(x, sd, "conv1", stride=2, padding=3), sd, "bn1"))
    x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)

    outs = []
    for stage, blocks in enumerate(STAGE_SIZES, start=1):
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            stride = 2 if (b == 0 and stage > 1) else 1
            y = F.relu(_bn(_conv(x, sd, f"{src}.conv1"), sd, f"{src}.bn1"))
            y = F.relu(_bn(_conv(y, sd, f"{src}.conv2", stride=stride, padding=1), sd, f"{src}.bn2"))
            y = _bn(_conv(y, sd, f"{src}.conv3"), sd, f"{src}.bn3")
            if f"{src}.downsample.0.weight" in sd:
                shortcut = _bn(_conv(x, sd, f"{src}.downsample.0", stride=stride), sd, f"{src}.downsample.1")
            else:
                shortcut = x
            x = F.relu(y + shortcut)
        outs.append(x)
    return tuple(o.numpy() for o in outs[-3:])
