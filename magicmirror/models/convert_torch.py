"""Convert torchvision-style ResNet state_dicts into our Flax Resnet4C params.

The reference initializes backbones from ImageNet weights (reference
network/model_res.py:688-734, incl. the 4-channel conv1 surgery at lines
712-715).  This offline environment cannot download them; users who have a
torchvision checkpoint (e.g. ``resnet34-b627a593.pth``) can convert it:

    from magicmirror.models.convert_torch import convert_resnet
    params = convert_resnet(torch.load('resnet34.pth'), arch='res34')

and graft it into the encoder params under the backbone subtree.
"""
from __future__ import annotations

import numpy as np


def _conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _four_channel_stem(w):
    """4-channel conv1 surgery (reference model_res.py:712-715): RGB weights
    kept, the mask channel initialized to the RGB mean."""
    w = np.asarray(w)
    out = np.zeros((w.shape[0], 4, w.shape[2], w.shape[3]), w.dtype)
    out[:, :3] = w
    out[:, 3] = w.mean(axis=1)
    return _conv(out)


def convert_resnet(state_dict: dict, arch: str = "res34") -> dict:
    """→ nested Flax params/batch_stats dicts matching ``Resnet4C``."""
    sd = {k: (v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v))
          for k, v in state_dict.items()}
    layers = {"res18": (2, 2, 2, 2), "res34": (3, 4, 6, 3),
              "res50": (3, 4, 6, 3)}[arch]
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def bn(prefix, name):
        put(params, (name, "scale"), sd[prefix + ".weight"])
        put(params, (name, "bias"), sd[prefix + ".bias"])
        put(stats, (name, "mean"), sd[prefix + ".running_mean"])
        put(stats, (name, "var"), sd[prefix + ".running_var"])

    put(params, ("conv1", "kernel"), _four_channel_stem(sd["conv1.weight"]))
    bn("bn1", "bn1")

    bottleneck = arch == "res50"
    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            tprefix = f"layer{li + 1}.{bi}"
            fname = f"layer{li + 1}_{bi}"
            # our BasicBlock/Bottleneck name their convs Conv_0.. and BN
            # BatchNorm_0.. in declaration order, downsample last
            for ci in range(n_convs):
                put(params, (fname, f"Conv_{ci}", "kernel"),
                    _conv(sd[f"{tprefix}.conv{ci + 1}.weight"]))
                bnp = f"{tprefix}.bn{ci + 1}"
                put(params, (fname, f"BatchNorm_{ci}", "scale"), sd[bnp + ".weight"])
                put(params, (fname, f"BatchNorm_{ci}", "bias"), sd[bnp + ".bias"])
                put(stats, (fname, f"BatchNorm_{ci}", "mean"), sd[bnp + ".running_mean"])
                put(stats, (fname, f"BatchNorm_{ci}", "var"), sd[bnp + ".running_var"])
            ds = f"{tprefix}.downsample"
            if ds + ".0.weight" in sd:
                put(params, (fname, f"Conv_{n_convs}", "kernel"),
                    _conv(sd[ds + ".0.weight"]))
                put(params, (fname, f"BatchNorm_{n_convs}", "scale"), sd[ds + ".1.weight"])
                put(params, (fname, f"BatchNorm_{n_convs}", "bias"), sd[ds + ".1.bias"])
                put(stats, (fname, f"BatchNorm_{n_convs}", "mean"), sd[ds + ".1.running_mean"])
                put(stats, (fname, f"BatchNorm_{n_convs}", "var"), sd[ds + ".1.running_var"])
    return {"params": params, "batch_stats": stats}
