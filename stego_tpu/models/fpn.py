"""FeaturePyramidNet: the reference's alternative `arch: "feature-pyramid"`.

Behavioral reference: src/modules.py:164-252. A frozen cut ResNet-50 provides
taps at strides 32/16/8 (layer4/3/2); granularity 1..4 builds a U-Net-ish
decoder with DoubleConv blocks, averages per-scale 1x1-conv cluster maps
bilinearly resized to 56x56, and log-softmaxes when discrete.

BatchNorm parity (reference DoubleConv, modules.py:255-272): train mode uses
batch statistics (like torch), eval mode uses EMA running statistics. The
running stats live as extra leaves (``ema_mean``/``ema_var``) inside the norm
param dicts; they receive zero gradients (unused by the training loss), and the
train step refreshes them after each optimizer update via
:meth:`FeaturePyramidNet.bn_state_update` (torch momentum-0.1 EMA with the
unbiased batch variance, matching nn.BatchNorm2d defaults).
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


def _init_norm(cout):
    return {
        "scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
        # running statistics (torch BatchNorm2d buffers); zero-grad leaves,
        # refreshed by bn_state_update
        "ema_mean": jnp.zeros((cout,)), "ema_var": jnp.ones((cout,)),
    }


def _init_double_conv(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _init_conv(k1, 3, 3, cin, cout),
        "norm1": _init_norm(cout),
        "conv2": _init_conv(k2, 3, 3, cout, cout),
        "norm2": _init_norm(cout),
    }


def _conv2d(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


BN_MOMENTUM = 0.1  # torch nn.BatchNorm2d default


def _batch_norm(x, p, train, stats=None, path=None, eps=1e-5):
    """torch BatchNorm2d semantics: batch statistics in train, running (EMA)
    statistics in eval. When ``stats`` is given, records the batch mean and
    UNBIASED variance under ``path`` (what torch folds into running_var)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        if stats is not None:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            stats[path] = (mean, unbiased)
    else:
        mean, var = p["ema_mean"], p["ema_var"]
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _double_conv(x, p, train, stats=None, path=""):
    x = jax.nn.relu(_batch_norm(_conv2d(x, p["conv1"]), p["norm1"], train,
                                stats, path + ".norm1"))
    return jax.nn.relu(_batch_norm(_conv2d(x, p["conv2"]), p["norm2"], train,
                                   stats, path + ".norm2"))


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
                  rng: Optional[jax.Array] = None,
                  stats: Optional[Dict] = None) -> jnp.ndarray:
        low_res = taps["layer4"]
        all_clusters = [_cluster_to_56(low_res, head["cluster1"])]

        if self.granularity >= 2:
            f1_up = interpolate(low_res, tuple(2 * s for s in
                                               low_res.shape[1:3]),
                                "bilinear", align_corners=False)
            f2 = _double_conv(
                jnp.concatenate([f1_up, taps["layer3"]], axis=-1),
                head["conv2"], train, stats, "conv2")
            all_clusters.append(_cluster_to_56(f2, head["cluster2"]))
        if self.granularity >= 3:
            f2_up = interpolate(f2, tuple(2 * s for s in f2.shape[1:3]),
                                "bilinear", align_corners=False)
            f3 = _double_conv(
                jnp.concatenate([f2_up, taps["layer2"]], axis=-1),
                head["conv3"], train, stats, "conv3")
            all_clusters.append(_cluster_to_56(f3, head["cluster3"]))
        if self.granularity >= 4:
            f3_up = interpolate(f3, tuple(2 * s for s in f3.shape[1:3]),
                                "bilinear", align_corners=False)
            img56 = interpolate(taps["img"], OUT_RES, "bilinear",
                                align_corners=False)
            f4 = _double_conv(jnp.concatenate([f3_up, img56], axis=-1),
                              head["conv4"], train, stats, "conv4")
            all_clusters.append(_cluster_to_56(f4, head["cluster4"]))

        avg_code = jnp.mean(jnp.stack(all_clusters, axis=0), axis=0)
        if self.continuous:
            return avg_code
        return jax.nn.log_softmax(avg_code, axis=-1)

    # BN running-state hook consumed by the train step ------------------
    has_bn_state = True

    def bn_state_update(self, head: Dict, taps: Dict,
                        momentum: float = BN_MOMENTUM) -> Dict:
        """Return ``head`` with EMA-refreshed BatchNorm running statistics
        (torch: running = (1-m)*running + m*batch, unbiased batch variance).
        Reruns the (tiny) decoder forward to observe the batch statistics of
        every norm; gradients never flow here."""
        stats: Dict = {}
        self.head_code(head, taps, train=True, stats=stats)
        new_head = jax.tree.map(lambda a: a, head)  # shallow-ish copy
        for path, (mean, var) in stats.items():
            conv, norm = path.split(".")
            p = dict(new_head[conv][norm])
            p["ema_mean"] = jax.lax.stop_gradient(
                (1 - momentum) * p["ema_mean"] + momentum * mean)
            p["ema_var"] = jax.lax.stop_gradient(
                (1 - momentum) * p["ema_var"] + momentum * var)
            new_head[conv] = dict(new_head[conv])
            new_head[conv][norm] = p
        return new_head

    def apply(self, backbone_params: Dict, head: Dict, img: jnp.ndarray,
              train: bool = False, rng: Optional[jax.Array] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        taps = self.backbone_features(backbone_params, img)
        code = self.head_code(head, taps, train=train, rng=rng)
        return taps["layer4"], code
