"""ResNet-50 backbone in pure JAX (NHWC), frozen feature-extractor mode.

Behavioral reference: the reference's ResNet zoo (`utils.load_model`,
src/utils.py:69-125) serves frozen eval-mode feature extractors for the
feature-pyramid arch (modules.py:164-252), KNN precompute, and the plotting
scripts. Since the backbone never trains, BatchNorm running statistics are
**folded into per-channel affine (w, b) pairs at conversion time** — each BN
becomes one fused multiply-add, which XLA fuses into the surrounding convs.

Taps follow the reference's ``NetWithActivations`` over
``nn.Sequential(*resnet.children())[:-1]`` with layer_nums {5, 6, 7}
(modules.py:187,192): children 5/6/7 are layer2/layer3/layer4, i.e. strides
8/16/32 with 512/1024/2048 channels.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np

BOTTLENECK_COUNTS = {"resnet50": (3, 4, 6, 3)}
STAGE_PLANES = (64, 128, 256, 512)
EXPANSION = 4
BN_EPS = 1e-5


# ----------------------------------------------------------------------
# init (random weights for tests; real use converts torch checkpoints)


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)


def _bn_init(c):
    return {"w": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


def init_resnet50_params(key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    params: Dict[str, Any] = {
        "conv1": {"kernel": _conv_init(next(keys), 7, 7, 3, 64)},
        "bn1": _bn_init(64),
    }
    cin = 64
    for stage, (planes, count) in enumerate(
        zip(STAGE_PLANES, BOTTLENECK_COUNTS["resnet50"]), start=1
    ):
        blocks: List[Dict[str, Any]] = []
        for b in range(count):
            cout = planes * EXPANSION
            blk = {
                "conv1": {"kernel": _conv_init(next(keys), 1, 1, cin, planes)},
                "bn1": _bn_init(planes),
                "conv2": {"kernel": _conv_init(next(keys), 3, 3, planes,
                                               planes)},
                "bn2": _bn_init(planes),
                "conv3": {"kernel": _conv_init(next(keys), 1, 1, planes,
                                               cout)},
                "bn3": _bn_init(cout),
            }
            if b == 0:
                blk["downsample"] = {
                    "conv": {"kernel": _conv_init(next(keys), 1, 1, cin, cout)},
                    "bn": _bn_init(cout),
                }
            blocks.append(blk)
            cin = cout
        params[f"layer{stage}"] = blocks
    return params


# ----------------------------------------------------------------------
# apply


def _conv(x, kernel, stride=1):
    # torch-style symmetric padding p = (k-1)//2 (XLA "SAME" pads
    # asymmetrically under stride 2 — not torch parity)
    p = (kernel.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p):
    return x * p["w"] + p["b"]


def _bottleneck(x, blk, stride):
    out = jax.nn.relu(_bn(_conv(x, blk["conv1"]["kernel"]), blk["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, blk["conv2"]["kernel"], stride=stride),
                          blk["bn2"]))
    out = _bn(_conv(out, blk["conv3"]["kernel"]), blk["bn3"])
    if "downsample" in blk:
        x = _bn(_conv(x, blk["downsample"]["conv"]["kernel"], stride=stride),
                blk["downsample"]["bn"])
    return jax.nn.relu(out + x)


def resnet50_features(params: Dict[str, Any], img: jnp.ndarray,
                      dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Returns taps {'stem', 'layer1'..'layer4', 'pooled'} (NHWC, float32)."""
    x = img.astype(dtype)
    p = jax.tree.map(lambda a: a.astype(dtype), params)
    x = jax.nn.relu(_bn(_conv(x, p["conv1"]["kernel"], stride=2), p["bn1"]))
    # maxpool 3x3 stride 2, torch padding=1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    taps = {"stem": x.astype(jnp.float32)}
    for stage in range(1, 5):
        stride = 1 if stage == 1 else 2
        for b, blk in enumerate(p[f"layer{stage}"]):
            x = _bottleneck(x, blk, stride if b == 0 else 1)
        taps[f"layer{stage}"] = x.astype(jnp.float32)
    taps["pooled"] = jnp.mean(taps["layer4"], axis=(1, 2))
    return taps


# ----------------------------------------------------------------------
# torch conversion


def _np(t):
    return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()


def _fold_bn(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[prefix + ".weight"]).astype(np.float64)
    b = _np(sd[prefix + ".bias"]).astype(np.float64)
    mean = _np(sd[prefix + ".running_mean"]).astype(np.float64)
    var = _np(sd[prefix + ".running_var"]).astype(np.float64)
    scale = w / np.sqrt(var + BN_EPS)
    return {
        "w": scale.astype(np.float32),
        "b": (b - mean * scale).astype(np.float32),
    }


def _conv_w(sd, name) -> Dict[str, np.ndarray]:
    # torch OIHW -> HWIO
    return {"kernel": _np(sd[name + ".weight"]).transpose(2, 3, 1, 0)
            .astype(np.float32)}


def resnet50_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision-style resnet50 state_dict -> params pytree (BN folded)."""
    params: Dict[str, Any] = {
        "conv1": _conv_w(sd, "conv1"),
        "bn1": _fold_bn(sd, "bn1"),
    }
    for stage, count in zip(range(1, 5), BOTTLENECK_COUNTS["resnet50"]):
        blocks = []
        for b in range(count):
            pre = f"layer{stage}.{b}"
            blk = {
                "conv1": _conv_w(sd, pre + ".conv1"),
                "bn1": _fold_bn(sd, pre + ".bn1"),
                "conv2": _conv_w(sd, pre + ".conv2"),
                "bn2": _fold_bn(sd, pre + ".bn2"),
                "conv3": _conv_w(sd, pre + ".conv3"),
                "bn3": _fold_bn(sd, pre + ".bn3"),
            }
            if pre + ".downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv_w(sd, pre + ".downsample.0"),
                    "bn": _fold_bn(sd, pre + ".downsample.1"),
                }
            blocks.append(blk)
        params[f"layer{stage}"] = blocks
    return params


def load_resnet_backbone(model_type: str, path: str) -> Dict[str, Any]:
    """Checkpoint-surgery parity with reference ``utils.load_model``
    (src/utils.py:69-125) for the checkpoint families we support."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if model_type == "mocov2":
        sd = ckpt["state_dict"]
        out = {}
        for k, v in sd.items():
            if k.startswith("module.encoder_q") and not k.startswith(
                "module.encoder_q.fc"
            ):
                out[k[len("module.encoder_q."):]] = v
        sd = out
    elif model_type == "robust_resnet50":
        sd = {
            name.split("model.")[1]: value
            for name, value in ckpt["model"].items() if "model" in name
        }
    elif model_type == "densecl":
        sd = ckpt["state_dict"]
    elif model_type == "resnet50":
        sd = ckpt if not isinstance(ckpt, dict) or "state_dict" not in ckpt \
            else ckpt["state_dict"]
    else:
        raise ValueError(f"No model: {model_type} found")
    return resnet50_params_from_torch(sd)
