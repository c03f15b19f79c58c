"""Converter activation parity beyond naming (VERDICT r2 item 8): build a
torch ResNet with the OFFICIAL torchvision module/state-dict layout (written
here from the public architecture definition — torchvision itself is not in
this image), run the converted weights through our Flax ``Resnet4C``, and
require the feature maps to match.  This pins the 4-channel conv1 surgery
(reference model_res.py:712-715), the OIHW→HWIO transposes, BN stat wiring,
stride placement, and maxpool padding — everything a naming round-trip
can't see."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from magicmirror.models.backbones import Resnet4C  # noqa: E402
from magicmirror.models.convert_torch import convert_resnet  # noqa: E402


class _TBasic(tnn.Module):
    expansion = 1

    def __init__(self, cin, cout, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return self.relu(h + idt)


class _TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, cout, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.conv3 = tnn.Conv2d(cout, cout * 4, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idt)


class _TResNetFeatures(tnn.Module):
    """torchvision ``ResNet`` feature extractor (no avgpool/fc), official
    child names so ``state_dict()`` keys match a real checkpoint's."""

    def __init__(self, block, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        for li, (n, w) in enumerate(zip(layers, (64, 128, 256, 512))):
            stride = 1 if li == 0 else 2
            setattr(self, f"layer{li + 1}", self._make(block, w, n, stride))

    def _make(self, block, planes, n, stride):
        down = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            down = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * block.expansion, 1,
                           stride, bias=False),
                tnn.BatchNorm2d(planes * block.expansion))
        blocks = [block(self.inplanes, planes, stride, down)]
        self.inplanes = planes * block.expansion
        for _ in range(1, n):
            blocks.append(block(self.inplanes, planes))
        return tnn.Sequential(*blocks)

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        h = self.layer1(h)
        h = self.layer2(h)
        h = self.layer3(h)
        return self.layer4(h)


def _randomize_bn(model, rs):
    """Non-trivial running stats so eval-mode BN actually tests the stat
    wiring (fresh BN has mean 0 / var 1, which hides swapped tensors)."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rs.uniform(-0.5, 0.5, m.running_mean.shape),
                dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rs.uniform(0.5, 2.0, m.running_var.shape),
                dtype=torch.float32))


@pytest.mark.parametrize("arch,block,layers", [
    ("res34", _TBasic, (3, 4, 6, 3)),
    ("res50", _TBottleneck, (3, 4, 6, 3)),
])
def test_resnet_converter_activation_parity(arch, block, layers):
    torch.manual_seed(0)
    rs = np.random.RandomState(0)
    tm = _TResNetFeatures(block, layers).eval()
    with torch.no_grad():
        _randomize_bn(tm, rs)

    variables = convert_resnet(tm.state_dict(), arch=arch)

    x4 = rs.rand(2, 64, 64, 4).astype(np.float32)
    # torch side replicates the converter's 4-channel stem surgery
    with torch.no_grad():
        w = tm.conv1.weight
        w4 = torch.zeros((w.shape[0], 4, 7, 7))
        w4[:, :3] = w
        w4[:, 3] = w.mean(dim=1)
        conv1_4 = tnn.Conv2d(4, 64, 7, 2, 3, bias=False)
        conv1_4.weight.copy_(w4)
        tin = torch.tensor(x4.transpose(0, 3, 1, 2))
        h = tm.maxpool(tm.relu(tm.bn1(conv1_4(tin))))
        h = tm.layer1(h)
        h = tm.layer2(h)
        h = tm.layer3(h)
        ref = tm.layer4(h).numpy().transpose(0, 2, 3, 1)

    out = Resnet4C(arch=arch, stride=2).apply(
        variables, jnp.asarray(x4), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)
