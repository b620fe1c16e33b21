"""Produce a GENUINE torchvision-format ResNet-50 checkpoint (.pth).

The reference trains from `torchvision.models.resnet50(pretrained=True)`
(`/root/reference/model/backbone/resnet50.py:12`); reproducing its results
on TPU therefore starts by grafting a real torchvision state dict through
`train/checkpoints.load_pretrained_backbone`.  torchvision itself is not
installed in this environment and the ImageNet weights file is not
fetchable (zero egress), so this script builds the exact torchvision
module graph in plain torch — identical state-dict keys, shapes, dtypes,
including `fc.*` and every `num_batches_tracked` — initializes it the way
torchvision does (kaiming fan-out convs, unit BN), perturbs the BN running
stats so layout bugs cannot hide behind mean=0/var=1 defaults, and
`torch.save`s the state dict.  The result is byte-layout-indistinguishable
from a real `resnet50-0676ba61.pth` download, so the whole graft path
(torch.load -> key mapping -> conv transpose -> BN stat placement) is
exercised for real; swap in the ImageNet file when network exists and
nothing else changes.

Usage: python scripts/make_torch_resnet50_pth.py out.pth [--seed 0]
"""
from __future__ import annotations

import argparse

import torch
import torch.nn as nn

STAGE_SIZES = (3, 4, 6, 3)
STAGE_WIDTHS = (64, 128, 256, 512)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: nn.Module | None = None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet50(nn.Module):
    """torchvision.models.resnet50's exact module graph and naming."""

    def __init__(self, num_classes: int = 1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, STAGE_SIZES[0], stride=1)
        self.layer2 = self._make_layer(128, STAGE_SIZES[1], stride=2)
        self.layer3 = self._make_layer(256, STAGE_SIZES[2], stride=2)
        self.layer4 = self._make_layer(512, STAGE_SIZES[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, num_classes)
        for m in self.modules():  # torchvision's init
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)

    def _make_layer(self, planes: int, blocks: int, stride: int) -> nn.Sequential:
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward_taps(self, x):
        """(C3, C4, C5) feature taps — the detector's backbone contract
        (reference resnet50.py:33-40)."""
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5

    def forward(self, x):
        _, _, c5 = self.forward_taps(x)
        return self.fc(torch.flatten(self.avgpool(c5), 1))


def build_model(seed: int = 0) -> ResNet50:
    torch.manual_seed(seed)
    model = ResNet50().eval()
    # real pretrained checkpoints carry non-trivial running stats; perturb
    # them so a mean<->var or scale<->bias mapping bug cannot hide
    with torch.no_grad():
        g = torch.Generator().manual_seed(seed + 1)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.num_batches_tracked.fill_(1000)
    return model


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    model = build_model(args.seed)
    torch.save(model.state_dict(), args.out)
    print(f"saved torchvision-format resnet50 state dict -> {args.out} "
          f"({len(model.state_dict())} tensors)")


if __name__ == "__main__":
    main()
