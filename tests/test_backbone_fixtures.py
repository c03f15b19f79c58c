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


# --------------------------------------------------------------- HRNet twin
# timm ``hrnet_w18_small_v2`` written from the public architecture (the
# flagship CUB recipe backbone, reference README.md:197 + network/
# model_res.py:775-805).  Child names reproduce timm's state_dict key layout
# exactly so ``convert_hrnet_w18sv2`` sees a real checkpoint's keys.

class _THRBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idt)


class _THRBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.relu(h + idt)


def _t_bottleneck(cin, planes, stride=1):
    down = None
    if stride != 1 or cin != planes * 4:
        down = tnn.Sequential(
            tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
            tnn.BatchNorm2d(planes * 4))
    return _THRBottleneck(cin, planes, stride, down)


class _THRModule(tnn.Module):
    """timm HighResolutionModule: branches (2 BasicBlocks each) + full fuse
    with ReLU after each fused sum."""

    def __init__(self, channels):
        super().__init__()
        self.channels = channels
        self.branches = tnn.ModuleList([
            tnn.Sequential(_THRBasic(c, c), _THRBasic(c, c))
            for c in channels])
        fuse = []
        for i, ci in enumerate(channels):
            row = []
            for j, cj in enumerate(channels):
                if j == i:
                    row.append(tnn.Identity())
                elif j > i:
                    row.append(tnn.Sequential(
                        tnn.Conv2d(cj, ci, 1, 1, bias=False),
                        tnn.BatchNorm2d(ci),
                        tnn.Upsample(scale_factor=2 ** (j - i),
                                     mode="nearest")))
                else:
                    steps = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = ci if last else cj
                        ops = [tnn.Conv2d(cj, cout, 3, 2, 1, bias=False),
                               tnn.BatchNorm2d(cout)]
                        if not last:
                            ops.append(tnn.ReLU(inplace=True))
                        steps.append(tnn.Sequential(*ops))
                    row.append(tnn.Sequential(*steps))
            fuse.append(tnn.ModuleList(row))
        self.fuse_layers = tnn.ModuleList(fuse)

    def forward(self, xs):
        ys = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        for i in range(len(self.channels)):
            acc = ys[i]
            for j in range(len(self.channels)):
                if j != i:
                    acc = acc + self.fuse_layers[i][j](ys[j])
            outs.append(torch.relu(acc))
        return outs


class _THRNetW18SmallV2(tnn.Module):
    def __init__(self):
        super().__init__()
        w = (18, 36, 72, 144)
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.layer1 = tnn.Sequential(_t_bottleneck(64, 64),
                                     _t_bottleneck(256, 64))
        self.transition1 = tnn.ModuleDict({
            "0": tnn.Sequential(tnn.Conv2d(256, w[0], 3, 1, 1, bias=False),
                                tnn.BatchNorm2d(w[0]), tnn.ReLU(True)),
            "1": tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(256, w[1], 3, 2, 1, bias=False),
                tnn.BatchNorm2d(w[1]), tnn.ReLU(True)))})
        self.stage2 = tnn.Sequential(_THRModule(w[:2]))
        self.transition2 = tnn.ModuleDict({
            "2": tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(w[1], w[2], 3, 2, 1, bias=False),
                tnn.BatchNorm2d(w[2]), tnn.ReLU(True)))})
        self.stage3 = tnn.Sequential(*[_THRModule(w[:3]) for _ in range(3)])
        self.transition3 = tnn.ModuleDict({
            "3": tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(w[2], w[3], 3, 2, 1, bias=False),
                tnn.BatchNorm2d(w[3]), tnn.ReLU(True)))})
        self.stage4 = tnn.Sequential(*[_THRModule(w) for _ in range(2)])
        hp = (32, 64, 128, 256)
        self.incre_modules = tnn.ModuleList([
            tnn.Sequential(_t_bottleneck(w[i], hp[i])) for i in range(4)])
        self.downsamp_modules = tnn.ModuleList([
            tnn.Sequential(
                tnn.Conv2d(hp[i] * 4, hp[i + 1] * 4, 3, 2, 1, bias=True),
                tnn.BatchNorm2d(hp[i + 1] * 4), tnn.ReLU(True))
            for i in range(3)])
        self.final_layer = tnn.Sequential(
            tnn.Conv2d(hp[3] * 4, 2048, 1, 1, bias=True),
            tnn.BatchNorm2d(2048), tnn.ReLU(True))

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.layer1(h)
        xs = [self.transition1["0"](h), self.transition1["1"](h)]
        xs = self.stage2(xs)
        xs = xs + [self.transition2["2"](xs[-1])]
        xs = self.stage3(xs)
        xs = xs + [self.transition3["3"](xs[-1])]
        xs = self.stage4(xs)
        y = self.incre_modules[0](xs[0])
        for i in range(3):
            y = self.incre_modules[i + 1](xs[i + 1]) + self.downsamp_modules[i](y)
        return self.final_layer(y)


def test_hrnet_w18sv2_converter_activation_parity():
    """Feature-map parity of the converted timm hrnet_w18_small_v2 layout
    through HRNetW18SmallV2_4C (4-ch stem surgery incl.).  The reference's
    ChannelAttention head gate is freshly initialized (not in the ImageNet
    checkpoint, model_res.py:798-805), so parity runs with_ca=False."""
    from magicmirror.models.backbones_zoo import HRNetW18SmallV2_4C
    from magicmirror.models.convert_torch import convert_hrnet_w18sv2

    torch.manual_seed(0)
    rs = np.random.RandomState(0)
    tm = _THRNetW18SmallV2().eval()
    with torch.no_grad():
        _randomize_bn(tm, rs)

    variables = convert_hrnet_w18sv2(tm.state_dict())

    x4 = rs.rand(2, 64, 64, 4).astype(np.float32)
    with torch.no_grad():
        wgt = tm.conv1.weight
        w4 = torch.zeros((64, 4, 3, 3))
        w4[:, :3] = wgt
        w4[:, 3] = wgt.mean(dim=1)
        conv1_4 = tnn.Conv2d(4, 64, 3, 2, 1, bias=False)
        conv1_4.weight.copy_(w4)
        tin = torch.tensor(x4.transpose(0, 3, 1, 2))
        h = torch.relu(tm.bn1(conv1_4(tin)))
        h = torch.relu(tm.bn2(tm.conv2(h)))
        h = tm.layer1(h)
        xs = [tm.transition1["0"](h), tm.transition1["1"](h)]
        xs = tm.stage2(xs)
        xs = xs + [tm.transition2["2"](xs[-1])]
        xs = tm.stage3(xs)
        xs = xs + [tm.transition3["3"](xs[-1])]
        xs = tm.stage4(xs)
        y = tm.incre_modules[0](xs[0])
        for i in range(3):
            y = tm.incre_modules[i + 1](xs[i + 1]) + tm.downsamp_modules[i](y)
        ref = tm.final_layer(y).numpy().transpose(0, 2, 3, 1)

    out = HRNetW18SmallV2_4C(with_ca=False).apply(
        variables, jnp.asarray(x4), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-4)
