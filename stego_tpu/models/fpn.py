"""FeaturePyramidNet: the reference's alternative `arch: "feature-pyramid"`.

Behavioral reference: src/modules.py:164-252. A frozen cut ResNet-50 provides
taps at strides 32/16/8 (layer4/3/2); granularity 1..4 builds a U-Net-ish
decoder with DoubleConv blocks, averages per-scale 1x1-conv cluster maps
bilinearly resized to 56x56, and log-softmaxes when discrete.

Deviation (documented): the reference's DoubleConv uses BatchNorm2d with
running statistics (modules.py:255-272); here the normalization uses **batch
statistics in both train and eval** (no running-stat state threading through
the functional train step). The decoder is a trained-from-scratch ablation
path, so the objective is unchanged; running stats can be added later if
bit-parity of this ablation arm matters.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stego_tpu.models.resnet import resnet50_features
from stego_tpu.ops.interp import interpolate

FEAT_CHANNELS = [2048, 1024, 512, 3]  # modules.py:189
EXTRA_CHANNELS = [128, 64, 32, 32]  # modules.py:190
SPATIAL_RESOLUTIONS = [7, 14, 28, 56]  # modules.py:188
OUT_RES = 56  # the hard-coded interpolation target (modules.py:167-169)


def _uniform(key, shape, fan_in):
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_conv(key, kh, kw, cin, cout):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    return {
        "kernel": _uniform(k1, (kh, kw, cin, cout), fan_in),
        "bias": _uniform(k2, (cout,), fan_in),
    }


def _init_double_conv(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _init_conv(k1, 3, 3, cin, cout),
        "norm1": {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,))},
        "conv2": _init_conv(k2, 3, 3, cout, cout),
        "norm2": {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,))},
    }


def _conv2d(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


def _batch_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _double_conv(x, p):
    x = jax.nn.relu(_batch_norm(_conv2d(x, p["conv1"]), p["norm1"]))
    return jax.nn.relu(_batch_norm(_conv2d(x, p["conv2"]), p["norm2"]))


def _cluster_to_56(x, p):
    """1x1 conv -> bilinear to 56 (reference make_clusterer + _helper)."""
    code = x @ p["kernel"][0, 0] + p["bias"]
    return interpolate(code, OUT_RES, "bilinear", align_corners=False)


class FeaturePyramidNet:
    """Same role/interface as DinoFeaturizer: init_head / backbone_features /
    head_code / apply."""

    def __init__(self, granularity: int, dim: int, continuous: bool,
                 backbone_dtype=jnp.float32):
        assert granularity in (1, 2, 3, 4)
        self.granularity = granularity
        self.dim = dim
        self.continuous = continuous
        self.n_feats = dim  # reference modules.py:195
        self.backbone_dtype = backbone_dtype
        self.use_dropout = False
        self.dropout_p = 0.0

    def init_head(self, key: jax.Array) -> Dict[str, Any]:
        ks = iter(jax.random.split(key, 16))
        head: Dict[str, Any] = {
            "cluster1": _init_conv(next(ks), 1, 1, FEAT_CHANNELS[0], self.dim),
        }
        if self.granularity >= 2:
            head["conv2"] = _init_double_conv(
                next(ks), FEAT_CHANNELS[0] + FEAT_CHANNELS[1],
                EXTRA_CHANNELS[1])
            head["cluster2"] = _init_conv(next(ks), 1, 1, EXTRA_CHANNELS[1],
                                          self.dim)
        if self.granularity >= 3:
            head["conv3"] = _init_double_conv(
                next(ks), EXTRA_CHANNELS[1] + FEAT_CHANNELS[2],
                EXTRA_CHANNELS[2])
            head["cluster3"] = _init_conv(next(ks), 1, 1, EXTRA_CHANNELS[2],
                                          self.dim)
        if self.granularity >= 4:
            head["conv4"] = _init_double_conv(
                next(ks), EXTRA_CHANNELS[2] + FEAT_CHANNELS[3],
                EXTRA_CHANNELS[3])
            head["cluster4"] = _init_conv(next(ks), 1, 1, EXTRA_CHANNELS[3],
                                          self.dim)
        return head

    def signal(self, taps):
        """Correlation-loss signal = the stride-32 tap
        (reference low_res_feats, modules.py:221,252)."""
        return taps["layer4"]

    def backbone_features(self, backbone_params: Dict, img: jnp.ndarray):
        """Frozen ResNet taps + the input image (granularity-4 concatenates
        the resized image, modules.py:241-242)."""
        taps = resnet50_features(backbone_params, img,
                                 dtype=self.backbone_dtype)
        out = {
            "layer2": taps["layer2"], "layer3": taps["layer3"],
            "layer4": taps["layer4"], "img": img,
        }
        return jax.lax.stop_gradient(out)

    def head_code(self, head: Dict, taps: Dict, train: bool = False,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
        low_res = taps["layer4"]
        all_clusters = [_cluster_to_56(low_res, head["cluster1"])]

        if self.granularity >= 2:
            f1_up = interpolate(low_res, tuple(2 * s for s in
                                               low_res.shape[1:3]),
                                "bilinear", align_corners=False)
            f2 = _double_conv(
                jnp.concatenate([f1_up, taps["layer3"]], axis=-1),
                head["conv2"])
            all_clusters.append(_cluster_to_56(f2, head["cluster2"]))
        if self.granularity >= 3:
            f2_up = interpolate(f2, tuple(2 * s for s in f2.shape[1:3]),
                                "bilinear", align_corners=False)
            f3 = _double_conv(
                jnp.concatenate([f2_up, taps["layer2"]], axis=-1),
                head["conv3"])
            all_clusters.append(_cluster_to_56(f3, head["cluster3"]))
        if self.granularity >= 4:
            f3_up = interpolate(f3, tuple(2 * s for s in f3.shape[1:3]),
                                "bilinear", align_corners=False)
            img56 = interpolate(taps["img"], OUT_RES, "bilinear",
                                align_corners=False)
            f4 = _double_conv(jnp.concatenate([f3_up, img56], axis=-1),
                              head["conv4"])
            all_clusters.append(_cluster_to_56(f4, head["cluster4"]))

        avg_code = jnp.mean(jnp.stack(all_clusters, axis=0), axis=0)
        if self.continuous:
            return avg_code
        return jax.nn.log_softmax(avg_code, axis=-1)

    def apply(self, backbone_params: Dict, head: Dict, img: jnp.ndarray,
              train: bool = False, rng: Optional[jax.Array] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        taps = self.backbone_features(backbone_params, img)
        code = self.head_code(head, taps, train=train, rng=rng)
        return taps["layer4"], code
