"""Torch checkpoint ingestion: DINO ``.pth`` backbones and STEGO Lightning
``.ckpt`` files -> stego_tpu parameter pytrees.

The reference loads DINO weights from a URL table (src/modules.py:35-44) and
its own released checkpoints via ``LitUnsupervisedSegmenter.load_from_checkpoint``
(src/eval_segmentation.py:67). We keep those on-disk formats as the interop
surface and convert to our stacked-block pytree layout. torch is used purely as
a deserializer on host; nothing torch touches the device path.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from stego_tpu.models.vit import VIT_CONFIGS, ViTConfig

# URL table parity (reference src/modules.py:35-44) — recorded for users who
# fetch the checkpoints out-of-band; this module only reads local files.
DINO_URLS = {
    ("vit_small", 16): "dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    ("vit_small", 8): "dino_deitsmall8_300ep_pretrain/dino_deitsmall8_300ep_pretrain.pth",
    ("vit_base", 16): "dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    ("vit_base", 8): "dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
}
DINO_URL_ROOT = "https://dl.fbaipublicfiles.com/dino/"


def _np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().cpu().numpy()


def strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip ``module.`` / ``backbone.`` prefixes like the reference does for
    user-supplied DINO checkpoints (src/modules.py:46-52)."""
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "").replace("backbone.", "")
        out[k] = v
    return out


def vit_params_from_torch(
    sd: Mapping[str, Any], cfg: ViTConfig
) -> Dict:
    """Convert a timm/DINO-style ViT state_dict to our stacked pytree.

    Key mapping (torch name -> pytree path):
      patch_embed.proj.{weight,bias}  -> patch_embed.{kernel,bias}  (OIHW->HWIO)
      cls_token, pos_embed            -> as-is
      blocks.{i}.norm1.{weight,bias}  -> blocks.norm1.{scale,bias}[i]
      blocks.{i}.attn.qkv.{weight,bias}   (out,in) -> (in,out)
      blocks.{i}.attn.proj.{weight,bias}
      blocks.{i}.norm2.*, blocks.{i}.mlp.fc{1,2}.*
      norm.{weight,bias}              -> norm.{scale,bias}
    """
    sd = strip_prefixes(sd)
    d, l = cfg.embed_dim, cfg.depth

    def g(name: str) -> np.ndarray:
        return _np(sd[name]).astype(np.float32)

    def stack(fmt: str, transpose: bool = False) -> np.ndarray:
        arrs = []
        for i in range(l):
            a = _np(sd[fmt.format(i)]).astype(np.float32)
            arrs.append(a.T if transpose else a)
        return np.stack(arrs)

    params = {
        "patch_embed": {
            # torch conv weight OIHW (D,3,p,p) -> HWIO (p,p,3,D)
            "kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": g("patch_embed.proj.bias"),
        },
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "blocks": {
            "norm1": {
                "scale": stack("blocks.{}.norm1.weight"),
                "bias": stack("blocks.{}.norm1.bias"),
            },
            "attn": {
                "qkv_kernel": stack("blocks.{}.attn.qkv.weight", transpose=True),
                "qkv_bias": stack("blocks.{}.attn.qkv.bias"),
                "proj_kernel": stack("blocks.{}.attn.proj.weight", transpose=True),
                "proj_bias": stack("blocks.{}.attn.proj.bias"),
            },
            "norm2": {
                "scale": stack("blocks.{}.norm2.weight"),
                "bias": stack("blocks.{}.norm2.bias"),
            },
            "mlp": {
                "fc1_kernel": stack("blocks.{}.mlp.fc1.weight", transpose=True),
                "fc1_bias": stack("blocks.{}.mlp.fc1.bias"),
                "fc2_kernel": stack("blocks.{}.mlp.fc2.weight", transpose=True),
                "fc2_bias": stack("blocks.{}.mlp.fc2.bias"),
            },
        },
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }
    assert params["pos_embed"].shape[-1] == d
    assert params["blocks"]["norm1"]["scale"].shape == (l, d)
    return params


def expand_patch_embed(params: Dict, in_chans: int) -> Dict:
    """Widen a 3-channel patch-embed kernel to ``in_chans`` by appending
    mean-of-RGB slices (the standard recipe for adding e.g. a near-IR channel
    to RGB-pretrained weights: activations are unchanged for inputs whose
    extra channels are zero-mean)."""
    kernel = np.asarray(params["patch_embed"]["kernel"])  # (P, P, 3, D)
    have = kernel.shape[2]
    if have == in_chans:
        return params
    if have != 3 or in_chans < 3:
        raise ValueError(f"cannot expand patch embed {have} -> {in_chans}")
    extra = np.repeat(kernel.mean(axis=2, keepdims=True), in_chans - have,
                      axis=2)
    out = dict(params)
    out["patch_embed"] = dict(params["patch_embed"])
    out["patch_embed"]["kernel"] = np.concatenate([kernel, extra], axis=2)
    return out


def load_dino_backbone(
    path: str, model_type: str, patch_size: int, in_chans: int = 3
) -> Tuple[Dict, ViTConfig]:
    """Load a DINO ``.pth`` file from disk (teacher dicts handled like
    reference src/modules.py:46-52). ``in_chans=4`` widens the patch embed
    for Potsdam-with-IR (config potsdam_ir=true)."""
    import dataclasses

    import torch

    cfg = VIT_CONFIGS[model_type][patch_size]
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "teacher" in sd:
        sd = sd["teacher"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = vit_params_from_torch(sd, cfg)
    if in_chans != 3:
        params = expand_patch_embed(params, in_chans)
        cfg = dataclasses.replace(cfg, in_chans=in_chans)
    return params, cfg


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    """torch 1x1 Conv2d weight (out,in,1,1) -> dense kernel (in,out)."""
    return w[:, :, 0, 0].T.astype(np.float32)


def head_params_from_torch(sd: Mapping[str, Any], prefix: str = "net.") -> Dict:
    """Convert the trainable STEGO head (cluster1/cluster2 1x1 convs,
    reference src/modules.py:73-81) from a Lightning state_dict."""
    out: Dict[str, Any] = {
        "cluster1": {
            "kernel": _conv1x1_to_dense(_np(sd[prefix + "cluster1.0.weight"])),
            "bias": _np(sd[prefix + "cluster1.0.bias"]).astype(np.float32),
        }
    }
    if prefix + "cluster2.0.weight" in sd:
        out["cluster2"] = {
            "fc1_kernel": _conv1x1_to_dense(_np(sd[prefix + "cluster2.0.weight"])),
            "fc1_bias": _np(sd[prefix + "cluster2.0.bias"]).astype(np.float32),
            "fc2_kernel": _conv1x1_to_dense(_np(sd[prefix + "cluster2.2.weight"])),
            "fc2_bias": _np(sd[prefix + "cluster2.2.bias"]).astype(np.float32),
        }
    return out


def infer_vit_cfg(sd: Mapping[str, Any]) -> ViTConfig:
    """Infer the ViT geometry from a state dict: patch/embed from the patch
    conv, depth from block count, heads from the standard head_dim=64 rule
    (vit_small 384->6, vit_base 768->12 — matches vision_transformer.py:266-277),
    trained image size from the positional-embedding token count."""
    w = _np(sd["patch_embed.proj.weight"])
    embed_dim, _, patch, _ = w.shape
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    n_tok = _np(sd["pos_embed"]).shape[1]
    side = int(round((n_tok - 1) ** 0.5))
    heads = max(1, embed_dim // 64)
    return ViTConfig(patch_size=patch, embed_dim=embed_dim, depth=depth,
                     num_heads=heads, img_size=side * patch)


def load_stego_checkpoint(path: str,
                          vit_cfg: Optional[ViTConfig] = None) -> Dict[str, Any]:
    """Load a released STEGO Lightning checkpoint.

    Returns a dict with:
      cfg_dict: the hyper_parameters cfg embedded by save_hyperparameters
                (reference train_segmentation.py:106)
      backbone: ViT params pytree        vit_cfg: ViTConfig
      head:     featurizer head params (cluster1 [+cluster2])
      linear_probe: {kernel (dim,n_classes), bias}
      cluster_probe: {clusters (n_classes+extra, dim)}
      train_cluster_probe: {clusters (n_classes, dim)}
      decoder: {kernel, bias} if present
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hp = ckpt.get("hyper_parameters", {})
    cfg_dict = dict(hp.get("cfg", hp)) if hp else {}
    sd = ckpt["state_dict"]

    backbone_sd = {
        k[len("net.model."):]: v for k, v in sd.items() if k.startswith("net.model.")
    }
    if vit_cfg is None:
        vit_cfg = infer_vit_cfg(backbone_sd)
    out: Dict[str, Any] = {
        "cfg_dict": cfg_dict,
        "vit_cfg": vit_cfg,
        "backbone": vit_params_from_torch(backbone_sd, vit_cfg),
        "head": head_params_from_torch(sd, prefix="net."),
        "linear_probe": {
            "kernel": _conv1x1_to_dense(_np(sd["linear_probe.weight"])),
            "bias": _np(sd["linear_probe.bias"]).astype(np.float32),
        },
        "cluster_probe": {
            "clusters": _np(sd["cluster_probe.clusters"]).astype(np.float32)
        },
    }
    if "train_cluster_probe.clusters" in sd:
        out["train_cluster_probe"] = {
            "clusters": _np(sd["train_cluster_probe.clusters"]).astype(np.float32)
        }
    if "decoder.weight" in sd:
        out["decoder"] = {
            "kernel": _conv1x1_to_dense(_np(sd["decoder.weight"])),
            "bias": _np(sd["decoder.bias"]).astype(np.float32),
        }
    return out
