"""DinoFeaturizer: frozen DINO ViT backbone + trainable projection head.

Behavioral reference: src/modules.py:17-118. TPU-native differences:
* NHWC feature maps ((B, H/p, W/p, C)) instead of NCHW;
* the backbone forward is wrapped in ``stop_gradient`` — under jit XLA prunes
  the (nonexistent) backward graph exactly like the reference's ``no_grad``;
* 1x1 convolutions are channel matmuls (dense kernels), which is what a 1x1
  conv lowers to on the MXU anyway;
* dropout uses explicit PRNG keys.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stego_tpu.models.vit import ViTConfig, vit_get_intermediate_feat


def _uniform_fan_in(key: jax.Array, shape, fan_in: int) -> jnp.ndarray:
    """torch nn.Linear/Conv2d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_featurizer_head(
    key: jax.Array, n_feats: int, dim: int, projection_type: Optional[str]
) -> Dict:
    """Head params: ``cluster1`` 1x1 conv, plus ``cluster2`` (1x1-ReLU-1x1)
    when nonlinear (reference make_clusterer / make_nonlinear_clusterer,
    src/modules.py:73-81)."""
    ks = jax.random.split(key, 6)
    params: Dict = {}
    if projection_type is None:
        return params
    params["cluster1"] = {
        "kernel": _uniform_fan_in(ks[0], (n_feats, dim), n_feats),
        "bias": _uniform_fan_in(ks[1], (dim,), n_feats),
    }
    if projection_type == "nonlinear":
        params["cluster2"] = {
            "fc1_kernel": _uniform_fan_in(ks[2], (n_feats, n_feats), n_feats),
            "fc1_bias": _uniform_fan_in(ks[3], (n_feats,), n_feats),
            "fc2_kernel": _uniform_fan_in(ks[4], (n_feats, dim), n_feats),
            "fc2_bias": _uniform_fan_in(ks[5], (dim,), n_feats),
        }
    return params


def dropout2d(x: jnp.ndarray, p: float, key: jax.Array) -> jnp.ndarray:
    """Channel dropout on NHWC maps (torch nn.Dropout2d parity: whole channels
    zeroed per sample, survivors scaled by 1/(1-p))."""
    if p <= 0.0:
        return x
    b, _, _, c = x.shape
    keep = jax.random.bernoulli(key, 1.0 - p, (b, 1, 1, c))
    return jnp.where(keep, x / (1.0 - p), 0.0).astype(x.dtype)


class DinoFeaturizer:
    """Functional featurizer; holds static config, no parameters.

    Usage::

        f = DinoFeaturizer(vit_cfg, dim=70, feat_type="feat",
                           projection_type="nonlinear", use_dropout=True)
        head = f.init_head(key)
        feats, code = f.apply(backbone, head, img, train=True, rng=key2)
    """

    def __init__(
        self,
        vit_cfg: ViTConfig,
        dim: int,
        feat_type: str = "feat",
        projection_type: Optional[str] = "nonlinear",
        use_dropout: bool = True,
        dropout_p: float = 0.1,
        backbone_dtype=jnp.float32,
        use_flash_attention: bool | None = None,
        mesh=None,
    ):
        if feat_type not in ("feat", "KK"):
            raise ValueError(f"Unknown feat type: {feat_type}")
        self.vit_cfg = vit_cfg
        self.dim = dim
        self.feat_type = feat_type
        self.projection_type = projection_type
        self.use_dropout = use_dropout
        self.dropout_p = dropout_p
        self.backbone_dtype = backbone_dtype
        if use_flash_attention is None:
            # bf16 production trunks take the Pallas kernel (measured 1.2x on
            # the 12-layer trunk fwd, v5e); f32 keeps the scan/einsum path for
            # torch-oracle parity and fast test compiles.
            use_flash_attention = backbone_dtype == jnp.bfloat16
        self.use_flash_attention = use_flash_attention
        # >1-device mesh: attention kernels run per batch shard (shard_map) —
        # the fast path survives multi-chip (parallel/mesh.py:shard_kernel)
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) \
            else None
        # both 'feat' (tokens) and 'KK' (heads*head_dim) have embed_dim channels
        self.n_feats = vit_cfg.embed_dim

    def init_head(self, key: jax.Array) -> Dict:
        return init_featurizer_head(key, self.n_feats, self.dim, self.projection_type)

    def signal(self, image_feat):
        """The array used as the correlation-loss signal / reconstruction
        target (identity here; FPN picks its low-res tap)."""
        return image_feat

    def backbone_features(
        self, backbone_params: Dict, img: jnp.ndarray
    ) -> jnp.ndarray:
        """Frozen-backbone spatial features, (B, H/p, W/p, n_feats) f32.

        Mirrors reference forward's no-grad region (src/modules.py:85-103):
        last-block normed patch tokens ('feat') or per-head keys ('KK').
        """
        cfg = self.vit_cfg
        b, h, w, _ = img.shape
        hp, wp = h // cfg.patch_size, w // cfg.patch_size
        want_qkv = self.feat_type == "KK"
        feats, _, qkvs = vit_get_intermediate_feat(
            backbone_params, img, cfg, n=1, dtype=self.backbone_dtype,
            want_attn_qkv=want_qkv, use_flash=self.use_flash_attention,
            mesh=self.mesh,
        )
        if self.feat_type == "feat":
            image_feat = feats[0][:, 1:, :].reshape(b, hp, wp, cfg.embed_dim)
        else:  # "KK": keys of the last block (src/modules.py:98-101)
            k = qkvs[0][1]  # (B, heads, N, head_dim)
            k = k[:, :, 1:, :]  # drop cls
            k = k.transpose(0, 2, 1, 3).reshape(b, hp, wp, cfg.embed_dim)
            image_feat = k.astype(jnp.float32)
        return jax.lax.stop_gradient(image_feat)

    def head_code(
        self,
        head_params: Dict,
        image_feat: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Trainable projection (src/modules.py:108-117): dropout2d -> cluster1,
        plus an independent dropout2d -> cluster2 added on for 'nonlinear'."""
        if self.projection_type is None:
            return image_feat
        if train and rng is not None:
            k1, k2 = jax.random.split(rng)
            x1 = dropout2d(image_feat, self.dropout_p, k1)
        else:
            x1 = image_feat
        p1 = head_params["cluster1"]
        code = x1 @ p1["kernel"] + p1["bias"]
        if self.projection_type == "nonlinear":
            x2 = dropout2d(image_feat, self.dropout_p, k2) if (
                train and rng is not None
            ) else image_feat
            p2 = head_params["cluster2"]
            h = jax.nn.relu(x2 @ p2["fc1_kernel"] + p2["fc1_bias"])
            code = code + (h @ p2["fc2_kernel"] + p2["fc2_bias"])
        return code

    def apply(
        self,
        backbone_params: Dict,
        head_params: Dict,
        img: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full forward: returns (feats, code), both NHWC.

        When ``use_dropout`` and training, the returned feats get their own
        dropout2d like the reference (src/modules.py:115-118).
        """
        if train and rng is not None:
            rng_feat, rng_head = jax.random.split(rng)
        else:
            rng_feat = rng_head = None
        image_feat = self.backbone_features(backbone_params, img)
        code = self.head_code(head_params, image_feat, train=train, rng=rng_head)
        if self.use_dropout and train and rng_feat is not None:
            out_feat = dropout2d(image_feat, self.dropout_p, rng_feat)
        else:
            out_feat = image_feat
        return out_feat, code
