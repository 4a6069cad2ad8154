"""Reverse converter: stego_tpu parameters -> reference-format Lightning .ckpt.

Models trained here can be loaded by the reference's
``LitUnsupervisedSegmenter.load_from_checkpoint`` (or re-ingested by
models/convert.py) for independent cross-framework verification. Inverts the
key mapping of models/convert.py: dense (in, out) kernels back to torch
(out, in[, 1, 1]); the stacked block axis unstacks into ``blocks.{i}.*``.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(x) -> "object":
    import torch

    return torch.from_numpy(np.asarray(x).copy())


def vit_state_dict(params: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Our ViT pytree -> timm/DINO-style torch state dict."""
    sd: Dict[str, Any] = {}
    p = prefix
    sd[p + "patch_embed.proj.weight"] = _t(
        np.asarray(params["patch_embed"]["kernel"]).transpose(3, 2, 0, 1))
    sd[p + "patch_embed.proj.bias"] = _t(params["patch_embed"]["bias"])
    sd[p + "cls_token"] = _t(params["cls_token"])
    sd[p + "pos_embed"] = _t(params["pos_embed"])
    sd[p + "norm.weight"] = _t(params["norm"]["scale"])
    sd[p + "norm.bias"] = _t(params["norm"]["bias"])

    blocks = params["blocks"]
    depth = np.asarray(blocks["norm1"]["scale"]).shape[0]
    for i in range(depth):
        pre = f"{p}blocks.{i}."
        sd[pre + "norm1.weight"] = _t(blocks["norm1"]["scale"][i])
        sd[pre + "norm1.bias"] = _t(blocks["norm1"]["bias"][i])
        sd[pre + "attn.qkv.weight"] = _t(
            np.asarray(blocks["attn"]["qkv_kernel"][i]).T)
        sd[pre + "attn.qkv.bias"] = _t(blocks["attn"]["qkv_bias"][i])
        sd[pre + "attn.proj.weight"] = _t(
            np.asarray(blocks["attn"]["proj_kernel"][i]).T)
        sd[pre + "attn.proj.bias"] = _t(blocks["attn"]["proj_bias"][i])
        sd[pre + "norm2.weight"] = _t(blocks["norm2"]["scale"][i])
        sd[pre + "norm2.bias"] = _t(blocks["norm2"]["bias"][i])
        sd[pre + "mlp.fc1.weight"] = _t(
            np.asarray(blocks["mlp"]["fc1_kernel"][i]).T)
        sd[pre + "mlp.fc1.bias"] = _t(blocks["mlp"]["fc1_bias"][i])
        sd[pre + "mlp.fc2.weight"] = _t(
            np.asarray(blocks["mlp"]["fc2_kernel"][i]).T)
        sd[pre + "mlp.fc2.bias"] = _t(blocks["mlp"]["fc2_bias"][i])
    return sd


def _dense_to_conv1x1(kernel, bias):
    w = np.asarray(kernel).T[:, :, None, None]  # (in,out) -> (out,in,1,1)
    return _t(w), _t(bias)


def export_stego_checkpoint(
    path: str,
    cfg,
    backbone: Dict[str, Any],
    params: Dict[str, Any],
    step: int = 0,
) -> None:
    """Write a reference-compatible Lightning checkpoint.

    ``params`` is the trainable pytree ({head, linear_probe, cluster_probe,
    train_cluster_probe, decoder}); ``cfg`` the Config (stored under
    hyper_parameters.cfg like save_hyperparameters, reference
    train_segmentation.py:106).
    """
    import torch

    sd: Dict[str, Any] = vit_state_dict(backbone, prefix="net.model.")

    head = params["head"]
    if "cluster1" in head:
        w, b = _dense_to_conv1x1(head["cluster1"]["kernel"],
                                 head["cluster1"]["bias"])
        sd["net.cluster1.0.weight"] = w
        sd["net.cluster1.0.bias"] = b
    if "cluster2" in head:
        w, b = _dense_to_conv1x1(head["cluster2"]["fc1_kernel"],
                                 head["cluster2"]["fc1_bias"])
        sd["net.cluster2.0.weight"] = w
        sd["net.cluster2.0.bias"] = b
        w, b = _dense_to_conv1x1(head["cluster2"]["fc2_kernel"],
                                 head["cluster2"]["fc2_bias"])
        sd["net.cluster2.2.weight"] = w
        sd["net.cluster2.2.bias"] = b

    w, b = _dense_to_conv1x1(params["linear_probe"]["kernel"],
                             params["linear_probe"]["bias"])
    sd["linear_probe.weight"] = w
    sd["linear_probe.bias"] = b
    sd["cluster_probe.clusters"] = _t(params["cluster_probe"]["clusters"])
    if "train_cluster_probe" in params:
        sd["train_cluster_probe.clusters"] = _t(
            params["train_cluster_probe"]["clusters"])
    if "decoder" in params:
        w, b = _dense_to_conv1x1(params["decoder"]["kernel"],
                                 params["decoder"]["bias"])
        sd["decoder.weight"] = w
        sd["decoder.bias"] = b

    torch.save({
        "state_dict": sd,
        "hyper_parameters": {"cfg": cfg.to_dict()},
        "global_step": int(step),
        "epoch": 0,
        "pytorch-lightning_version": "1.1.8",  # reference environment.yml
    }, path)
