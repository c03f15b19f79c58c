"""VGG19 feature extractor (reference network/model_res.py:48-82): the
perceptual-feature encoder (relu3 slice) used by the landmark-consistency
branch.  Pretrained weights optional (convert a torchvision state_dict with
``convert_vgg19``); random init otherwise."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])

# VGG19 conv plan up to relu3_4 (torchvision features[0:12])
_SLICES = [(64, 64), (128, 128), (256, 256)]


class VGG19Features(nn.Module):
    """Input NHWC RGBA/RGB in [0,1]; returns relu3 features at 1/4 res."""

    @nn.compact
    def __call__(self, x):
        x = (x[..., :3] - IMAGENET_MEAN) / IMAGENET_STD
        for si, widths in enumerate(_SLICES):
            for wi, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding=1, name=f"conv{si+1}_{wi+1}")(x)
                x = nn.relu(x)
            if si < len(_SLICES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def convert_vgg19(state_dict: dict) -> dict:
    """torchvision vgg19().features state_dict → Flax params for the slice."""
    sd = {k: (v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v))
          for k, v in state_dict.items()}
    # torchvision features indices of the convs we keep
    idxs = [0, 2, 5, 7, 10, 12]
    names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2"]
    params = {}
    for i, name in zip(idxs, names):
        params[name] = {
            "kernel": sd[f"{i}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{i}.bias"],
        }
    return {"params": params}
