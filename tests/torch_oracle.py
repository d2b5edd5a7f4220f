"""Test oracle: import the reference torch implementation (read-only at
/root/reference) to validate numerical parity of the JAX rebuild.

The reference needs torchvision (absent) only for `models.resnet50`; we
stub it with a generic torch ResNet-50 (public torchvision architecture)
and neuter the pretrained-weight downloads (zero-egress sandbox).
Nothing from the reference is copied — it is imported as a black box.
"""
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REFERENCE = "/root/reference"


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class _TorchResNet50(nn.Module):
    """torchvision-compatible resnet50 (attribute/state-dict layout)."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make(64, 3)
        self.layer2 = self._make(128, 4, stride=2)
        self.layer3 = self._make(256, 6, stride=2)
        self.layer4 = self._make(512, 3, stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, 1000)

    def _make(self, planes, blocks, stride=1):
        ds = None
        if stride != 1 or self.inplanes != planes * 4:
            ds = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, ds)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes)
                   for _ in range(blocks - 1)]
        return nn.Sequential(*layers)


def install_reference_stubs():
    """Make /root/reference importable: stub torchvision + model zoo."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet50 = lambda pretrained=False, **kw: _TorchResNet50()
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    # Zero-egress: pretrained fetches become empty dicts (mod_resnet then
    # keeps its random init, which is all a parity test needs).
    import torch.utils.model_zoo as _mz

    _mz.load_url = lambda *a, **k: {}
    # fbrs' Cython BFS dist-maps (CPU path) can't build without Cython;
    # the GPU/closed-form path never calls it.
    if "fbrs.utils.cython" not in sys.modules:
        cy = types.ModuleType("fbrs.utils.cython")

        def _no_cython(*a, **k):
            raise RuntimeError("cython dist maps stubbed out in tests")

        cy.get_dist_maps = _no_cython
        sys.modules["fbrs.utils.cython"] = cy
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def randomize_(module: nn.Module, seed: int = 0) -> None:
    """Randomize every parameter AND BN running stat so frozen-BN parity
    is actually exercised (fresh BN stats are trivially mean 0 var 1)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


def to_numpy_sd(module: nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def nhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)
