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


def _tree_put(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(w):
    return np.asarray(w).T  # torch (out, in) -> flax (in, out)


def convert_densenet(state_dict: dict, arch: str = "densenet121") -> dict:
    """torchvision densenet ``features`` state_dict -> DenseNet4C variables
    (4-channel conv0 surgery included, reference model_res.py:748-751)."""
    sd = {k: (v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v))
          for k, v in state_dict.items()}
    blocks = {"densenet121": (6, 12, 24, 16),
              "densenet161": (6, 12, 36, 24)}[arch]
    params: dict = {}
    stats: dict = {}

    def bn(prefix, name):
        path = (name,) if isinstance(name, str) else tuple(name)
        _tree_put(params, path + ("scale",), sd[prefix + ".weight"])
        _tree_put(params, path + ("bias",), sd[prefix + ".bias"])
        _tree_put(stats, path + ("mean",), sd[prefix + ".running_mean"])
        _tree_put(stats, path + ("var",), sd[prefix + ".running_var"])

    _tree_put(params, ("conv0", "kernel"),
              _four_channel_stem(sd["features.conv0.weight"]))
    bn("features.norm0", "norm0")
    for bi, n_layers in enumerate(blocks):
        for li in range(n_layers):
            t = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            f = f"denseblock{bi + 1}_l{li + 1}"
            bn(t + ".norm1", (f, "norm1"))
            _tree_put(params, (f, "conv1", "kernel"),
                      _conv(sd[t + ".conv1.weight"]))
            bn(t + ".norm2", (f, "norm2"))
            _tree_put(params, (f, "conv2", "kernel"),
                      _conv(sd[t + ".conv2.weight"]))
        if bi < 3:
            t = f"features.transition{bi + 1}"
            bn(t + ".norm", f"transition{bi + 1}_norm")
            _tree_put(params, (f"transition{bi + 1}_conv", "kernel"),
                      _conv(sd[t + ".conv.weight"]))
    bn("features.norm5", "norm5")
    return {"params": params, "batch_stats": stats}


def convert_hrnet_w18sv2(state_dict: dict) -> dict:
    """timm ``hrnet_w18_small_v2`` state_dict -> HRNetW18SmallV2_4C variables
    (4-channel 3x3 conv1 surgery, reference model_res.py:791-794; the
    reference's freshly-initialized ChannelAttention gate keeps its init)."""
    sd = {k: (v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v))
          for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def _flat(path):
        if isinstance(path, str):
            return (path,)
        out = []
        for p in path:
            out.extend(_flat(p))
        return tuple(out)

    def bn(prefix, path):
        path = _flat(path)
        _tree_put(params, path + ("scale",), sd[prefix + ".weight"])
        _tree_put(params, path + ("bias",), sd[prefix + ".bias"])
        _tree_put(stats, path + ("mean",), sd[prefix + ".running_mean"])
        _tree_put(stats, path + ("var",), sd[prefix + ".running_var"])

    def conv(prefix, path, bias=False):
        path = _flat(path)
        _tree_put(params, path + ("kernel",), _conv(sd[prefix + ".weight"]))
        if bias:
            _tree_put(params, path + ("bias",), sd[prefix + ".bias"])

    def block(tprefix, fname, n_convs):
        for ci in range(1, n_convs + 1):
            conv(f"{tprefix}.conv{ci}", (fname, f"conv{ci}"))
            bn(f"{tprefix}.bn{ci}", (fname, f"bn{ci}"))
        if f"{tprefix}.downsample.0.weight" in sd:
            conv(f"{tprefix}.downsample.0", (fname, "ds_conv"))
            bn(f"{tprefix}.downsample.1", (fname, "ds_bn"))

    _tree_put(params, ("conv1", "kernel"),
              _four_channel_stem(sd["conv1.weight"]))
    bn("bn1", "bn1")
    conv("conv2", "conv2")
    bn("bn2", "bn2")
    for i in range(2):
        block(f"layer1.{i}", f"layer1_{i}", 3)
    # transitions: existing-branch 3x3 is Sequential(conv,bn,relu); new-branch
    # downsample path is nested one deeper (Sequential of Sequentials)
    conv("transition1.0.0", "transition1_0_conv")
    bn("transition1.0.1", "transition1_0_bn")
    conv("transition1.1.0.0", "transition1_1_conv")
    bn("transition1.1.0.1", "transition1_1_bn")
    conv("transition2.2.0.0", "transition2_2_conv")
    bn("transition2.2.0.1", "transition2_2_bn")
    conv("transition3.3.0.0", "transition3_3_conv")
    bn("transition3.3.0.1", "transition3_3_bn")

    stages = {"stage2": (1, 2), "stage3": (3, 3), "stage4": (2, 4)}
    for sname, (n_mod, n_br) in stages.items():
        for m in range(n_mod):
            mod = f"{sname}_m{m}"
            for b in range(n_br):
                for k in range(2):
                    block(f"{sname}.{m}.branches.{b}.{k}",
                          (mod, f"branch{b}_block{k}"), 2)
            for i in range(n_br):
                for j in range(n_br):
                    if i == j:
                        continue
                    t = f"{sname}.{m}.fuse_layers.{i}.{j}"
                    if j > i:
                        conv(t + ".0", (mod, f"fuse{i}_{j}_conv"))
                        bn(t + ".1", (mod, f"fuse{i}_{j}_bn"))
                    else:
                        for k in range(i - j):
                            conv(f"{t}.{k}.0", (mod, f"fuse{i}_{j}_conv{k}"))
                            bn(f"{t}.{k}.1", (mod, f"fuse{i}_{j}_bn{k}"))
    for i in range(4):
        block(f"incre_modules.{i}.0", f"incre{i}", 3)
    for i in range(3):
        conv(f"downsamp_modules.{i}.0", (f"downsamp{i}_conv",), bias=True)
        bn(f"downsamp_modules.{i}.1", f"downsamp{i}_bn")
    conv("final_layer.0", ("final_conv",), bias=True)
    bn("final_layer.1", "final_bn")
    return {"params": params, "batch_stats": stats}


def convert_swinv2(state_dict: dict,
                   depths=(2, 2, 18, 2)) -> dict:
    """timm ``swinv2_base_window12to16_192to256`` state_dict -> SwinV2Base4C
    params.  The reference loads with strict=False leaving the 3-channel
    patch embed randomly initialized (model_res.py:758-766); we instead apply
    the same RGB-mean 4-channel surgery used for conv stems."""
    sd = {k: (v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v))
          for k, v in state_dict.items()}
    params: dict = {}

    def ln(prefix, path):
        if isinstance(path, str):
            path = (path,)
        _tree_put(params, path + ("scale",), sd[prefix + ".weight"])
        _tree_put(params, path + ("bias",), sd[prefix + ".bias"])

    _tree_put(params, ("patch_embed", "kernel"),
              _four_channel_stem(sd["patch_embed.proj.weight"]))
    _tree_put(params, ("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    ln("patch_embed.norm", "patch_norm")
    for si, depth in enumerate(depths):
        if si > 0:
            t = f"layers.{si}.downsample"
            f = f"stage{si}_downsample"
            _tree_put(params, (f, "reduction", "kernel"),
                      _linear(sd[t + ".reduction.weight"]))
            ln(t + ".norm", (f, "norm"))
        for di in range(depth):
            t = f"layers.{si}.blocks.{di}"
            f = f"stage{si}_block{di}"
            a = (f, "attn")
            _tree_put(params, a + ("qkv_kernel",),
                      _linear(sd[t + ".attn.qkv.weight"]))
            _tree_put(params, a + ("q_bias",), sd[t + ".attn.q_bias"])
            _tree_put(params, a + ("v_bias",), sd[t + ".attn.v_bias"])
            _tree_put(params, a + ("logit_scale",),
                      np.asarray(sd[t + ".attn.logit_scale"]))
            _tree_put(params, a + ("cpb_fc1", "kernel"),
                      _linear(sd[t + ".attn.cpb_mlp.0.weight"]))
            _tree_put(params, a + ("cpb_fc1", "bias"),
                      sd[t + ".attn.cpb_mlp.0.bias"])
            _tree_put(params, a + ("cpb_fc2", "kernel"),
                      _linear(sd[t + ".attn.cpb_mlp.2.weight"]))
            _tree_put(params, a + ("proj", "kernel"),
                      _linear(sd[t + ".attn.proj.weight"]))
            _tree_put(params, a + ("proj", "bias"), sd[t + ".attn.proj.bias"])
            ln(t + ".norm1", (f, "norm1"))
            _tree_put(params, (f, "mlp_fc1", "kernel"),
                      _linear(sd[t + ".mlp.fc1.weight"]))
            _tree_put(params, (f, "mlp_fc1", "bias"), sd[t + ".mlp.fc1.bias"])
            _tree_put(params, (f, "mlp_fc2", "kernel"),
                      _linear(sd[t + ".mlp.fc2.weight"]))
            _tree_put(params, (f, "mlp_fc2", "bias"), sd[t + ".mlp.fc2.bias"])
            ln(t + ".norm2", (f, "norm2"))
    ln("norm", "norm")
    return {"params": params}
