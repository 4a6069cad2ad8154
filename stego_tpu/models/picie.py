"""PiCIE baseline (PanopticFPN) for eval-time comparison rows.

Behavioral reference: src/picie/{backbone,fpn}.py — a torchvision-style ResNet
returning res2..res5 taps plus an FPN decoder of four 1x1 convs with
upsample-add, used only to render "PiCIE (Baseline)" rows in eval
(eval_segmentation.py:70-75,143-145,195-198). Reuses our JAX ResNet-50; the
decoder is four channel matmuls + torch-parity bilinear upsampling.

The released ``picie_and_probes.pth`` pickles whole torch modules (not state
dicts); :func:`load_picie_checkpoint` unpickles them with permissive class
stubs and extracts the tensors.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.models.resnet import (
    resnet50_features,
    resnet50_params_from_torch,
)
from stego_tpu.ops.interp import interpolate

OUT_DIM = 256  # resnet50 FPNDecoder out_dim (picie/fpn.py:27)
DECODER_IN = {"layer1": 2048, "layer2": 1024, "layer3": 512, "layer4": 256}


def init_picie_decoder(key: jax.Array) -> Dict[str, Any]:
    ks = jax.random.split(key, 8)
    out = {}
    for i, (name, cin) in enumerate(DECODER_IN.items()):
        bound = 1.0 / (cin**0.5)
        out[name] = {
            "kernel": jax.random.uniform(ks[2 * i], (cin, OUT_DIM),
                                         jnp.float32, -bound, bound),
            "bias": jax.random.uniform(ks[2 * i + 1], (OUT_DIM,), jnp.float32,
                                       -bound, bound),
        }
    return out


def picie_features(backbone: Dict, decoder: Dict, img: jnp.ndarray
                   ) -> jnp.ndarray:
    """PanopticFPN forward (picie/fpn.py:34-45): 1x1-conv laterals with
    upsample-add from res5 down to res2; output stride 4."""
    taps = resnet50_features(backbone, img)
    res = {"res2": taps["layer1"], "res3": taps["layer2"],
           "res4": taps["layer3"], "res5": taps["layer4"]}

    def lateral(name, x):
        return x @ decoder[name]["kernel"] + decoder[name]["bias"]

    def up_add(x, y):
        return interpolate(x, y.shape[1:3], "bilinear",
                           align_corners=False) + y

    o1 = lateral("layer1", res["res5"])
    o2 = up_add(o1, lateral("layer2", res["res4"]))
    o3 = up_add(o2, lateral("layer3", res["res3"]))
    o4 = up_add(o3, lateral("layer4", res["res2"]))
    return o4


def picie_decoder_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    def np_(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    out = {}
    for name in DECODER_IN:
        w = np_(sd[f"decoder.{name}.weight"])  # (out, in, 1, 1)
        out[name] = {
            "kernel": w[:, :, 0, 0].T.astype(np.float32),
            "bias": np_(sd[f"decoder.{name}.bias"]).astype(np.float32),
        }
    return out


def load_picie_checkpoint(path: str) -> Dict[str, Any]:
    """Best-effort loader for the released picie_and_probes.pth.

    Returns {'backbone', 'decoder', 'cluster_probe', 'cluster_stats'}.
    The file pickles full torch modules; missing classes are stubbed so the
    tensors can be extracted.
    """
    import pickle

    import torch

    class _Permissive(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (torch.nn.Module,), {"__init__":
                                                       lambda self: None})

    with open(path, "rb") as f:
        try:
            state = torch.load(
                f, map_location="cpu", weights_only=False,
                pickle_module=type("pm", (), {
                    "Unpickler": _Permissive, "load": pickle.load,
                }),
            )
        except Exception as e:  # pragma: no cover - depends on file
            raise RuntimeError(
                f"could not unpickle {path}: {e}. Extract a state_dict with "
                "the reference environment and pass it to "
                "picie_params_from_state_dict instead."
            ) from e

    model = state["model"]
    model_sd = model.state_dict() if hasattr(model, "state_dict") else model
    out = picie_params_from_state_dict(model_sd)
    probe = state.get("cluster_probe")
    if probe is not None:
        if hasattr(probe, "module"):
            probe = probe.module
        psd = probe.state_dict() if hasattr(probe, "state_dict") else probe
        key = "clusters" if "clusters" in psd else list(psd)[0]
        out["cluster_probe"] = {
            "clusters": np.asarray(psd[key].detach().cpu()).astype(np.float32)
        }
    metrics = state.get("cluster_metrics")
    if metrics is not None and hasattr(metrics, "stats"):
        out["cluster_stats"] = np.asarray(metrics.stats.detach().cpu())
    return out


def picie_params_from_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items()
        if k.startswith("backbone.")
    }
    return {
        "backbone": resnet50_params_from_torch(backbone_sd),
        "decoder": picie_decoder_from_torch(sd),
    }
