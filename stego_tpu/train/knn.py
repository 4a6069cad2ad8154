"""Global KNN index build, sharded over the data mesh.

Behavioral reference: src/precompute_knns.py — global-mean-pooled, L2-normalized
per-image DINO features at res 224, then a full NxN cosine-similarity top-30.
TPU-native: the embedding pass runs as a sharded jit over the data mesh (each
device embeds its batch shard); the NxN similarity is a row-chunked MXU matmul
with on-device top-k — rows sharded over devices, the (small) feature table
replicated. Output keeps the reference's ``.npz`` cache format/naming so
reference-produced caches interoperate (data.py:503-511).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.models.featurizer import DinoFeaturizer
from stego_tpu.ops.math import l2_normalize
from stego_tpu.parallel.mesh import batch_sharding, replicated_sharding


def make_embed_fn(net: DinoFeaturizer, backbone, mesh=None):
    """jit'd (img -> normalized mean-pooled feature) with the batch sharded
    over the mesh (reference get_feats, precompute_knns.py:15-21)."""

    def embed(img):
        feats = net.backbone_features(backbone, img)  # (B, h, w, C)
        pooled = jnp.mean(feats, axis=(1, 2))
        return l2_normalize(pooled, axis=1)

    if mesh is None:
        return jax.jit(embed)
    return jax.jit(
        embed,
        in_shardings=batch_sharding(mesh),
        out_shardings=replicated_sharding(mesh),
    )


def embed_dataset(embed_fn, loader) -> np.ndarray:
    """(N, D) normalized features, collected on host."""
    chunks = []
    for batch in loader:
        img = batch["img"] if isinstance(batch, dict) else batch
        chunks.append(np.asarray(embed_fn(jnp.asarray(img))))
    return np.concatenate(chunks, axis=0)


def topk_neighbors(
    feats: np.ndarray, k: int = 30, n_chunks: int = 16,
    mesh=None, max_sims_bytes: int = 1 << 30,
) -> np.ndarray:
    """Row-chunked all-pairs cosine top-k (reference
    precompute_knns.py:86-94). Each chunk is one MXU matmul + on-device top_k;
    with a mesh, chunk rows are sharded over devices against a replicated
    table. Chunk rows are capped so the similarity block stays under
    ``max_sims_bytes`` (CocoStuff-scale N would otherwise build multi-GB
    blocks with the reference's fixed 16 chunks)."""
    n = feats.shape[0]
    k = min(k, n)
    table = jnp.asarray(feats)

    def chunk_topk(rows, table):
        sims = jnp.einsum("nf,mf->nm", rows, table,
                          preferred_element_type=jnp.float32)
        _, idx = jax.lax.top_k(sims, k)
        return idx

    if mesh is None:
        fn = jax.jit(chunk_topk)
    else:
        fn = jax.jit(
            chunk_topk,
            in_shardings=(batch_sharding(mesh), replicated_sharding(mesh)),
            out_shardings=replicated_sharding(mesh),
        )

    step = max(1, n // n_chunks)
    step = min(step, max(1, max_sims_bytes // (4 * n)))
    if mesh is not None:
        d = mesh.devices.size
        step = max(d, (step // d) * d)
    out = []
    i = 0
    while i < n:
        rows = table[i:i + step]
        pad = 0
        if mesh is not None and rows.shape[0] % mesh.devices.size != 0:
            pad = mesh.devices.size - rows.shape[0] % mesh.devices.size
            rows = jnp.pad(rows, ((0, pad), (0, 0)))
        idx = np.asarray(fn(rows, table))
        if pad:
            idx = idx[:-pad]
        out.append(idx)
        i += step
    return np.concatenate(out, axis=0)


def build_knn_cache(
    cache_file: str,
    net: DinoFeaturizer,
    backbone,
    loader,
    k: int = 30,
    mesh=None,
) -> np.ndarray:
    """Embed + top-k + save compressed npz (same format as the reference)."""
    embed_fn = make_embed_fn(net, backbone, mesh)
    feats = embed_dataset(embed_fn, loader)
    nns = topk_neighbors(feats, k=k, mesh=mesh)
    os.makedirs(os.path.dirname(cache_file), exist_ok=True)
    np.savez_compressed(cache_file, nns=nns)
    return nns
