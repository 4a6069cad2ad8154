"""Model packaging for serving: a self-contained deployable artifact.

The reference's closest analogue is the Colab/demo path — load a Lightning
checkpoint with the full Python model code and run ad-hoc inference
(reference src/demo_segmentation.py, STEGO_Colab_Demo.ipynb). Production
serving wants the opposite: an artifact that runs WITHOUT the training
codebase. TPU-natively that is `jax.export`: the jitted flip-TTA inference
function (backbone forward → code → probe log-probs → argmax) is staged to
StableHLO and serialized. Unlike compiled-executable caching (which cannot
cross processes on tunneled platforms — see TODO.md #11), the StableHLO
artifact is portable across processes, hosts, and jax point releases, and is
compiled for whatever devices the serving process sees.

Artifact layout (a directory):
    model.bin     serialized jax.export.Exported (StableHLO + treedefs)
    weights.npz   flattened backbone + head/probe parameters
    meta.json     input spec (res, batch, channels), class count, config echo

``ServingModel.load`` + ``predict`` is the whole serving API; predictions are
(linear_preds, cluster_preds) int32 maps at input resolution plus the
log-prob tensors.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "//"


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def _mesh(n_devices: int):
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < n_devices:
        raise ValueError(
            f"artifact needs {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), ("data",))


def _shardings(mesh):
    """(backbone, params, img) shardings: weights replicated, batch split
    over the data axis. ``mesh`` may be a concrete Mesh (load side) or an
    AbstractMesh (export side — packaging a multi-chip artifact must not
    require the packaging host to own the chips)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P("data"))
    return (rep, rep, batch)


def _abstract_mesh(n_devices: int):
    from jax.sharding import AbstractMesh

    return AbstractMesh((n_devices,), ("data",))


def _serve_fn(seg):
    """Flip-TTA inference on a [0,1] RGB(A) batch — the serving contract
    takes RAW images so the normalization constants ship inside the artifact
    (reference eval_segmentation.py:124-131 math)."""
    from stego_tpu.data.transforms import channel_stats
    from stego_tpu.models.probes import cluster_lookup, linear_probe_logits
    from stego_tpu.ops.interp import interpolate

    def fn(backbone, params, img01):
        mean, std = (jnp.asarray(s) for s in channel_stats(img01.shape[-1]))
        img = (img01.astype(jnp.float32) - mean) / std
        # two backbone calls in one jitted program — measured faster than a
        # concat-batched call (see evaluate.py:make_eval_step)
        _, code1 = seg.net.apply(backbone, params["head"], img, train=False)
        _, code2 = seg.net.apply(backbone, params["head"], img[:, :, ::-1],
                                 train=False)
        code = (code1 + code2[:, :, ::-1]) / 2.0
        code = interpolate(code, img.shape[1:3], "bilinear",
                           align_corners=False)
        linear_probs = jax.nn.log_softmax(
            linear_probe_logits(params["linear_probe"], code), axis=-1)
        cluster_probs = cluster_lookup(params["cluster_probe"], code,
                                       alpha=2.0, log_probs=True)
        return {
            "linear_probs": linear_probs,
            "cluster_probs": cluster_probs,
            "linear_preds": jnp.argmax(linear_probs, axis=-1).astype(jnp.int32),
            "cluster_preds": jnp.argmax(cluster_probs, axis=-1).astype(jnp.int32),
        }

    return fn


def package_from_parts(seg, backbone, params, out_dir: str,
                       res: int, batch_size: int, n_devices: int = 1) -> str:
    """Export (segmenter, weights) as a serving artifact directory.

    ``n_devices > 1`` exports an SPMD program: the batch is sharded over a
    1-D ``data`` mesh and the weights replicated, so the loaded artifact
    runs data-parallel across the serving host's chips (the load-side mesh
    is rebuilt from ``jax.devices()[:n_devices]``)."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    in_chans = seg.vit_cfg.in_chans if seg.vit_cfg is not None else 3
    serve_params = {
        "head": params["head"],
        "linear_probe": params["linear_probe"],
        "cluster_probe": params["cluster_probe"],
    }
    backbone = jax.tree.map(jnp.asarray, backbone)
    serve_params = jax.tree.map(jnp.asarray, serve_params)
    if batch_size % n_devices:
        raise ValueError(f"n_devices={n_devices} must divide "
                         f"batch_size={batch_size}")
    if getattr(seg.net, "use_flash_attention", False) is not False:
        # ALL exports take the einsum attention path (oracle-identical): a
        # Mosaic (Pallas) custom call baked into the StableHLO would pin the
        # artifact to a TPU backend with the package-time interpret-mode
        # decision frozen in, defeating the artifact's documented portability
        # across hosts/backends/jax releases (a CPU serving process could
        # never run it). The kernel fast path remains the in-process story.
        from stego_tpu.train.segmenter import UnsupervisedSegmenter

        seg = UnsupervisedSegmenter(
            seg.n_classes, seg.cfg.replace(use_flash_attention=False),
            vit_cfg=seg.vit_cfg,
        )

    fn = jax.jit(
        _serve_fn(seg),
        in_shardings=(_shardings(_abstract_mesh(n_devices))
                      if n_devices > 1 else None),
    )

    # batch-polymorphic artifact: the batch axis is a symbolic dimension, so
    # ONE artifact serves any batch size (all spatial dims stay static). SPMD
    # exports use ``n_devices * b`` — the expression guarantees the
    # divisibility the sharded batch axis needs, so one multi-chip artifact
    # serves any multiple of the mesh size.
    (b_dim,) = jexport.symbolic_shape("b")
    img_spec = jax.ShapeDtypeStruct(
        (n_devices * b_dim if n_devices > 1 else b_dim, res, res, in_chans),
        jnp.float32)
    exported = jexport.export(fn)(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     backbone),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     serve_params),
        img_spec,
    )
    with open(os.path.join(out_dir, "model.bin"), "wb") as f:
        f.write(exported.serialize())
    np.savez_compressed(
        os.path.join(out_dir, "weights.npz"),
        **_flatten({"backbone": jax.device_get(backbone),
                    "params": jax.device_get(serve_params)}),
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({
            "res": res, "batch_size": batch_size, "in_chans": in_chans,
            "n_devices": n_devices, "n_classes": seg.n_classes,
            "extra_clusters": seg.cfg.extra_clusters,
            "batch_polymorphic": True,
            "input": "float32 [0,1] RGB(A), NHWC",
        }, f, indent=2)
    return out_dir


def package(model_path: str, out_dir: str, res: int = 320,
            batch_size: int = 8, n_devices: int = 1) -> str:
    """Package a trained checkpoint (orbax dir or Lightning .ckpt)."""
    from stego_tpu.eval.evaluate import load_model_for_eval

    seg, backbone, params = load_model_for_eval(model_path)
    return package_from_parts(seg, backbone, params, out_dir, res, batch_size,
                              n_devices=n_devices)


class ServingModel:
    """Loads a packaged artifact and serves predictions — no model code, no
    config system, no checkpoint manager; just StableHLO + weights."""

    def __init__(self, call, backbone, params, meta: Dict[str, Any],
                 batch_sharding=None):
        self._call = call
        self._backbone = backbone
        self._params = params
        self._batch_sharding = batch_sharding
        self.meta = meta

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        from jax import export as jexport

        with open(os.path.join(path, "model.bin"), "rb") as f:
            exported = jexport.deserialize(f.read())
        flat = dict(np.load(os.path.join(path, "weights.npz")))
        tree = _unflatten(flat)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        call = jax.jit(exported.call)
        # device-resident weights: passing numpy trees would re-transfer the
        # whole backbone on every predict (seconds on slow links)
        n_dev = int(meta.get("n_devices", 1))
        bsh = None
        if n_dev > 1:
            rep, _, bsh = _shardings(_mesh(n_dev))
            backbone = jax.device_put(tree["backbone"], rep)
            params = jax.device_put(tree["params"], rep)
        else:
            backbone = jax.tree.map(jnp.asarray, tree["backbone"])
            params = jax.tree.map(jnp.asarray, tree["params"])
        return cls(call, backbone, params, meta, batch_sharding=bsh)

    def predict(self, img01: np.ndarray) -> Dict[str, np.ndarray]:
        """img01: (B, res, res, C) float32 in [0, 1] matching meta['res'].
        Artifacts are batch-polymorphic: any B >= 1 single-device, any
        positive multiple of meta['n_devices'] for SPMD artifacts (pad the
        batch if short)."""
        if self._batch_sharding is not None:
            n_dev = int(self.meta.get("n_devices", 1))
            if len(img01) % n_dev:
                raise ValueError(
                    f"SPMD artifact needs a batch divisible by {n_dev}, "
                    f"got {len(img01)} (pad the final batch)")
            # one transfer, straight to the sharded layout (jnp.asarray would
            # commit to device 0 first and reshard device-to-device)
            img = jax.device_put(np.asarray(img01), self._batch_sharding)
        else:
            img = jnp.asarray(img01)
        out = self._call(self._backbone, self._params, img)
        return jax.tree.map(np.asarray, out)


def main(argv=None):
    """CLI: python -m stego_tpu.serve model_path=<ckpt> output_dir=<dir>
    [res=320] [batch_size=8] — then from the serving side:
    ``ServingModel.load(dir).predict(batch)``."""
    from stego_tpu.config import prep_args

    args = prep_args(argv)
    model_path = args.pop("model_path")
    output_dir = args.pop("output_dir")
    res = int(args.pop("res", 320))
    batch_size = int(args.pop("batch_size", 8))
    n_devices = int(args.pop("n_devices", 1))
    if args:  # fail on typos BEFORE the expensive export trace
        raise ValueError(f"Unknown args: {sorted(args)}")
    out = package(model_path, output_dir, res=res, batch_size=batch_size,
                  n_devices=n_devices)
    print(f"packaged serving artifact at {out}")


if __name__ == "__main__":
    main()
