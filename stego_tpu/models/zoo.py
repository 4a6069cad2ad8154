"""Backbone zoo beyond ResNet-50: VGG-11 and DenseNet-121 feature extractors.

Behavioral reference: ``utils.load_model`` (src/utils.py:69-125) offers
resnet50 variants (models/resnet.py), densenet121 and vgg11, all cut to their
feature trunks + global average pooling. In the reference these serve as
alternative frozen embedders for the KNN index and the plotting scripts; the
FPN decoder's channel table is ResNet-specific, so these are embedders only.
All frozen — BatchNorm folds to per-channel affine at conversion.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ----------------------------------------------------------------------
# VGG-11 (configuration A): 64 M 128 M 256 256 M 512 512 M 512 512 M


VGG11_CFG = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]


def init_vgg11_params(key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    params = []
    cin = 3
    for v in VGG11_CFG:
        if v == "M":
            continue
        fan_in = 9 * cin
        k1, k2 = jax.random.split(next(keys))
        params.append({
            "kernel": ((2.0 / fan_in) ** 0.5)
            * jax.random.normal(k1, (3, 3, cin, v), jnp.float32),
            "bias": jnp.zeros((v,), jnp.float32),
        })
        cin = v
    return {"convs": params}


def vgg11_features(params: Dict[str, Any], img: jnp.ndarray,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Feature trunk + global average pool -> (B, 512)."""
    x = img.astype(dtype)
    it = iter(params["convs"])
    for v in VGG11_CFG:
        if v == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        else:
            p = next(it)
            x = jax.lax.conv_general_dilated(
                x, p["kernel"].astype(dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"].astype(dtype)
            x = jax.nn.relu(x)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def vgg11_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision vgg11 state dict (features.{idx}.weight OIHW)."""
    def np_(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    idxs = sorted(
        int(k.split(".")[1]) for k in sd
        if k.startswith("features.") and k.endswith(".weight")
    )
    convs = [{
        "kernel": np_(sd[f"features.{i}.weight"]).transpose(2, 3, 1, 0)
        .astype(np.float32),
        "bias": np_(sd[f"features.{i}.bias"]).astype(np.float32),
    } for i in idxs]
    return {"convs": convs}


# ----------------------------------------------------------------------
# DenseNet-121: blocks (6, 12, 24, 16), growth 32, init 64


DENSENET121_BLOCKS = (6, 12, 24, 16)
GROWTH = 32


def _bn_affine(c):
    return {"w": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


def _conv_he(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    return ((2.0 / fan) ** 0.5) * jax.random.normal(
        key, (kh, kw, cin, cout), jnp.float32)


def init_densenet121_params(key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))
    params: Dict[str, Any] = {
        "conv0": {"kernel": _conv_he(next(keys), 7, 7, 3, 64)},
        "norm0": _bn_affine(64),
        "blocks": [],
        "transitions": [],
    }
    c = 64
    for bi, n_layers in enumerate(DENSENET121_BLOCKS):
        layers = []
        for _ in range(n_layers):
            layers.append({
                "norm1": _bn_affine(c),
                "conv1": {"kernel": _conv_he(next(keys), 1, 1, c, 4 * GROWTH)},
                "norm2": _bn_affine(4 * GROWTH),
                "conv2": {"kernel": _conv_he(next(keys), 3, 3, 4 * GROWTH,
                                             GROWTH)},
            })
            c += GROWTH
        params["blocks"].append(layers)
        if bi < len(DENSENET121_BLOCKS) - 1:
            params["transitions"].append({
                "norm": _bn_affine(c),
                "conv": {"kernel": _conv_he(next(keys), 1, 1, c, c // 2)},
            })
            c = c // 2
    params["norm5"] = _bn_affine(c)
    return params


def _bn(x, p):
    return x * p["w"] + p["b"]


def _conv(x, kernel, stride=1):
    pad = (kernel.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def densenet121_features(params: Dict[str, Any], img: jnp.ndarray,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Feature trunk + relu + global average pool -> (B, 1024)."""
    p = jax.tree.map(lambda a: a.astype(dtype), params)
    x = _conv(img.astype(dtype), p["conv0"]["kernel"], stride=2)
    x = jax.nn.relu(_bn(x, p["norm0"]))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for bi, layers in enumerate(p["blocks"]):
        feats = x
        for layer in layers:
            h = jax.nn.relu(_bn(feats, layer["norm1"]))
            h = _conv(h, layer["conv1"]["kernel"])
            h = jax.nn.relu(_bn(h, layer["norm2"]))
            h = _conv(h, layer["conv2"]["kernel"])
            feats = jnp.concatenate([feats, h], axis=-1)
        x = feats
        if bi < len(p["transitions"]):
            t = p["transitions"][bi]
            x = _conv(jax.nn.relu(_bn(x, t["norm"])), t["conv"]["kernel"])
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    x = jax.nn.relu(_bn(x, p["norm5"]))
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def _fold_bn_np(sd, prefix, eps=1e-5):
    def np_(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    w = np_(sd[prefix + ".weight"]).astype(np.float64)
    b = np_(sd[prefix + ".bias"]).astype(np.float64)
    mean = np_(sd[prefix + ".running_mean"]).astype(np.float64)
    var = np_(sd[prefix + ".running_var"]).astype(np.float64)
    s = w / np.sqrt(var + eps)
    return {"w": s.astype(np.float32), "b": (b - mean * s).astype(np.float32)}


def densenet121_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision densenet121 state dict (features.* keys, BN folded)."""
    def np_(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    def kern(name):
        return {"kernel": np_(sd[name + ".weight"]).transpose(2, 3, 1, 0)
                .astype(np.float32)}

    params: Dict[str, Any] = {
        "conv0": kern("features.conv0"),
        "norm0": _fold_bn_np(sd, "features.norm0"),
        "blocks": [], "transitions": [],
    }
    for bi, n_layers in enumerate(DENSENET121_BLOCKS, start=1):
        layers = []
        for li in range(1, n_layers + 1):
            pre = f"features.denseblock{bi}.denselayer{li}"
            layers.append({
                "norm1": _fold_bn_np(sd, pre + ".norm1"),
                "conv1": kern(pre + ".conv1"),
                "norm2": _fold_bn_np(sd, pre + ".norm2"),
                "conv2": kern(pre + ".conv2"),
            })
        params["blocks"].append(layers)
        if bi < len(DENSENET121_BLOCKS):
            pre = f"features.transition{bi}"
            params["transitions"].append({
                "norm": _fold_bn_np(sd, pre + ".norm"),
                "conv": kern(pre + ".conv"),
            })
    params["norm5"] = _fold_bn_np(sd, "features.norm5")
    return params


# ----------------------------------------------------------------------
# Embedder facade used by precompute_knns for non-dino archs


class CutBackboneEmbedder:
    """Mean-pooled frozen embedder matching the reference's cut models
    (``nn.Sequential(*children)[:-1]`` + pooling, precompute_knns.py:56-58)."""

    def __init__(self, model_type: str, backbone_dtype=jnp.float32):
        self.model_type = model_type
        self.backbone_dtype = backbone_dtype

    def load_or_init(self, pretrained_weights: Optional[str], key: jax.Array):
        if self.model_type in ("resnet50", "mocov2", "robust_resnet50",
                               "densecl"):
            from stego_tpu.models.resnet import (
                init_resnet50_params,
                load_resnet_backbone,
            )

            if pretrained_weights:
                return load_resnet_backbone(self.model_type,
                                            pretrained_weights)
            return init_resnet50_params(key)
        if self.model_type == "vgg11":
            if pretrained_weights:
                import torch

                sd = torch.load(pretrained_weights, map_location="cpu",
                                weights_only=False)
                return vgg11_params_from_torch(
                    sd.get("state_dict", sd) if isinstance(sd, dict) else sd)
            return init_vgg11_params(key)
        if self.model_type == "densenet121":
            if pretrained_weights:
                import torch

                sd = torch.load(pretrained_weights, map_location="cpu",
                                weights_only=False)
                return densenet121_params_from_torch(
                    sd.get("state_dict", sd) if isinstance(sd, dict) else sd)
            return init_densenet121_params(key)
        raise ValueError(f"No model: {self.model_type} found")

    def backbone_features(self, backbone, img: jnp.ndarray) -> jnp.ndarray:
        """(B, D) pooled embedding, returned as (B, 1, 1, D) so the generic
        mean-pool in knn.make_embed_fn is a no-op."""
        if self.model_type == "vgg11":
            pooled = vgg11_features(backbone, img, dtype=self.backbone_dtype)
        elif self.model_type == "densenet121":
            pooled = densenet121_features(backbone, img,
                                          dtype=self.backbone_dtype)
        else:
            from stego_tpu.models.resnet import resnet50_features

            pooled = resnet50_features(backbone, img,
                                       dtype=self.backbone_dtype)["pooled"]
        return jax.lax.stop_gradient(pooled[:, None, None, :])