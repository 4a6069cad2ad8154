"""DINO Vision Transformer, TPU-native.

Functional reimplementation of the DINO ViT family (behavioral reference:
src/dino/vision_transformer.py) designed for XLA:TPU rather than translated
from torch:

* parameters live in a plain pytree with the 12 transformer blocks **stacked
  along a leading depth axis**, so the trunk runs as a single ``lax.scan`` —
  one compiled block body instead of 12 unrolled ones (fast compiles, identical
  math);
* NHWC image layout; patch embedding is one strided conv that XLA maps onto the
  MXU;
* compute dtype is configurable (bfloat16 trunk with float32 layernorm/softmax
  accumulation for production, float32 for parity tests);
* bicubic positional-embedding interpolation for arbitrary input resolutions
  matches torch semantics exactly (reference vision_transformer.py:176-196) via
  :mod:`stego_tpu.ops.interp`;
* ``vit_get_intermediate_feat`` mirrors ``get_intermediate_feat``
  (vision_transformer.py:225-237): normed tokens + attention + raw qkv of the
  last ``n`` blocks. Only the last ``n`` blocks run outside the scan.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from stego_tpu.ops.interp import interpolate


@dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    img_size: int = 224  # resolution the positional embedding was trained at
    in_chans: int = 3    # 4 for Potsdam-with-IR (config potsdam_ir=true)

    @property
    def n_patches_side(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


def _mk(name: str, patch_size: int, embed_dim: int, num_heads: int) -> ViTConfig:
    return ViTConfig(patch_size=patch_size, embed_dim=embed_dim, num_heads=num_heads)


# Factories mirroring reference vit_tiny/vit_small/vit_base
# (vision_transformer.py:259-277).
VIT_CONFIGS: Dict[str, Dict[int, ViTConfig]] = {
    "vit_tiny": {p: _mk("vit_tiny", p, 192, 3) for p in (8, 16)},
    "vit_small": {p: _mk("vit_small", p, 384, 6) for p in (8, 16)},
    "vit_base": {p: _mk("vit_base", p, 768, 12) for p in (8, 16)},
}


def trunc_normal(key: jax.Array, shape, std: float = 0.02) -> jnp.ndarray:
    """Truncated-normal init (±2σ), the only live piece of reference
    src/dino/utils.py (trunc_normal_, :482-520)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def init_vit_params(key: jax.Array, cfg: ViTConfig) -> Dict:
    """Random init mirroring the reference's init distributions
    (vision_transformer.py:163-174): trunc_normal(0.02) linear weights &
    pos/cls embeddings, zero biases, unit layernorm."""
    d, l, m = cfg.embed_dim, cfg.depth, cfg.mlp_dim
    n_tok = cfg.n_patches_side**2 + 1
    ks = jax.random.split(key, 8)

    def zeros(*s):
        return jnp.zeros(s, jnp.float32)

    def ones(*s):
        return jnp.ones(s, jnp.float32)

    blocks = {
        "norm1": {"scale": ones(l, d), "bias": zeros(l, d)},
        "attn": {
            "qkv_kernel": trunc_normal(ks[0], (l, d, 3 * d)),
            "qkv_bias": zeros(l, 3 * d),
            "proj_kernel": trunc_normal(ks[1], (l, d, d)),
            "proj_bias": zeros(l, d),
        },
        "norm2": {"scale": ones(l, d), "bias": zeros(l, d)},
        "mlp": {
            "fc1_kernel": trunc_normal(ks[2], (l, d, m)),
            "fc1_bias": zeros(l, m),
            "fc2_kernel": trunc_normal(ks[3], (l, m, d)),
            "fc2_bias": zeros(l, d),
        },
    }
    return {
        "patch_embed": {
            "kernel": trunc_normal(
                ks[4], (cfg.patch_size, cfg.patch_size, cfg.in_chans, d)),
            "bias": zeros(d),
        },
        "cls_token": trunc_normal(ks[5], (1, 1, d)),
        "pos_embed": trunc_normal(ks[6], (1, n_tok, d)),
        "blocks": blocks,
        "norm": {"scale": ones(d), "bias": zeros(d)},
    }


def cast_params_for_compute(params: Dict, dtype=jnp.bfloat16) -> Dict:
    """Store the transformer blocks' matmul weights/biases in the compute
    dtype.

    The trunk consumes these tensors exclusively through
    ``.astype(x.dtype)`` (bf16 trunks), so a bf16 trunk with f32 storage
    re-converts every weight EVERY STEP — the round-5 ViT-B profile charged
    ~0.26 ms per converted weight stack (~86M params ≈ 500 MB of per-step
    HBM read). Casting storage once is bitwise-identical compute: the same
    bf16 values enter the dots. LayerNorm scale/bias (consumed in f32 for
    exact statistics), patch embed, cls token, pos embed (bicubically
    interpolated in f32), and the final norm keep f32 storage. No-op for
    float32 ``dtype`` or non-ViT pytrees (missing "blocks")."""
    if dtype == jnp.float32 or "blocks" not in params:
        return params
    out = dict(params)
    blocks = dict(params["blocks"])
    for grp in ("attn", "mlp"):
        blocks[grp] = {k: v.astype(dtype) for k, v in blocks[grp].items()}
    out["blocks"] = blocks
    return out


def _layer_norm(p: Dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LayerNorm with float32 statistics regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# Kill switch for the Pallas block layernorm (scripts/bench_ln.py A/B).
# Read at TRACE time: flipping it affects only functions jitted afterwards —
# an already-compiled train step keeps whichever form it was traced with.
FUSED_LN = True


def _block_ln(p: Dict, x: jnp.ndarray, eps: float, use_flash: bool,
              mesh=None) -> jnp.ndarray:
    """Block layernorm: single-pass Pallas kernel on the unrolled bf16
    trunk (measured 0.064 vs 0.158 ms per LN at (32, 785, 384) on v5e,
    bit-identical output — scripts/bench_ln.py); pure XLA everywhere else
    (f32 oracle parity, scanned trunks, portable jax.export artifacts)."""
    if use_flash and FUSED_LN and x.dtype == jnp.bfloat16:
        from stego_tpu.ops.layer_norm import fused_layer_norm

        return fused_layer_norm(x, p["scale"], p["bias"], eps, mesh=mesh)
    return _layer_norm(p, x, eps)


def _attention(
    p: Dict, x: jnp.ndarray, num_heads: int, want_qkv: bool,
    use_flash: bool = False, mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray | None, jnp.ndarray | None]:
    """Self-attention block (reference Attention.forward,
    vision_transformer.py:78-90). Returns (out, attn, qkv).

    When the caller does not need attention probabilities (the scanned trunk
    blocks), the forward-only flash kernel avoids materializing the N x N
    attention matrix (ops/flash_attention.py)."""
    b, n, d = x.shape
    hd = d // num_heads
    scale = hd**-0.5
    if use_flash and not want_qkv:
        from stego_tpu.ops.flash_attention import (
            token_major_attention,
            use_pair_attention,
        )

        if use_pair_attention(num_heads, hd, n):
            # TOKEN-MAJOR fast path (DINO ViT-S/B): q/k/v stay dense
            # (B, N, D) — the projections run as plain dots (~97% MXU
            # vs ~48% when a head-major transpose folds into their output
            # layout; round-4 ViT-B profile) and the pair kernels read/write
            # native 128-lane head-pair slices, so NO head-major relayout
            # exists anywhere in the sublayer. Measured: 12-sublayer chain
            # 27.2 -> 19.95 ms (ViT-B b=32 N=785, scripts/bench_attn_vitb.py);
            # round 5 extended past N_pad=1152 via the kv-resident pair
            # kernel (res-320 eval / res-448 demo; scripts/bench_eval.py).
            wk = p["qkv_kernel"].astype(x.dtype)
            bk = p["qkv_bias"].astype(x.dtype)
            q = x @ wk[:, :d] + bk[:d]
            k = x @ wk[:, d:2 * d] + bk[d:2 * d]
            v = x @ wk[:, 2 * d:] + bk[2 * d:]
            out = token_major_attention(q, k, v, num_heads, scale, mesh=mesh)
            out = out @ p["proj_kernel"].astype(x.dtype) \
                + p["proj_bias"].astype(x.dtype)
            return out, None, None
    if want_qkv:
        # the packed (3, B, H, N, hd) tensor is itself a return value
        # (dino_feat_type="KK" consumers; reference vision_transformer.py:86)
        qkv = x @ p["qkv_kernel"].astype(x.dtype) + p["qkv_bias"].astype(
            x.dtype)
        qkv = qkv.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, hd)
    else:
        # three separate projections: same math as the packed matmul, but
        # each (B, N, H, hd) -> (B, H, N, hd) transpose folds into its dot's
        # output layout instead of slicing a packed 3-way tensor. Measured
        # per layer on v5e: 1.88 -> 1.57 ms at trunk batch 32 (the packed
        # unpack degrades further at batch 64: XLA emits a
        # slice_bitcast_fusion at ~4x the copy's per-image cost).
        wk = p["qkv_kernel"].astype(x.dtype)
        bk = p["qkv_bias"].astype(x.dtype)
        qkv = None

        def _proj(i):
            y = (x @ wk[:, i * d:(i + 1) * d])
            y = y.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
            return y + bk[i * d:(i + 1) * d].reshape(num_heads, 1, hd)

        q, k, v = _proj(0), _proj(1), _proj(2)
    out = None
    if use_flash and not want_qkv:
        from stego_tpu.ops.flash_attention import trunk_attention

        out = trunk_attention(q, k, v, scale, mesh=mesh)  # None -> einsum
        attn = None
    if out is None:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        # bf16 trunks materialize the (N x N) logits in bf16 — softmax (with
        # max subtraction) is stable there and attention is HBM-bound, so this
        # halves the dominant traffic. f32 trunks keep full precision.
        attn = jax.nn.softmax(logits.astype(x.dtype), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(x.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = out @ p["proj_kernel"].astype(x.dtype) + p["proj_bias"].astype(x.dtype)
    if want_qkv:
        return out, attn, qkv
    return out, None, None


def _block(
    p: Dict, x: jnp.ndarray, cfg: ViTConfig, want_qkv: bool = False,
    use_flash: bool = False, mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray | None, jnp.ndarray | None]:
    """Pre-LN transformer block (reference Block.forward,
    vision_transformer.py:106-114). DropPath is identity: DINO eval / frozen
    backbone never enables stochastic depth."""
    y, attn, qkv = _attention(
        p["attn"], _block_ln(p["norm1"], x, cfg.ln_eps, use_flash, mesh),
        cfg.num_heads, want_qkv, use_flash=use_flash, mesh=mesh)
    x = x + y
    h = _block_ln(p["norm2"], x, cfg.ln_eps, use_flash, mesh)
    x = x + _mlp(p["mlp"], h)
    return x, attn, qkv


def _mlp(p: Dict, h: jnp.ndarray) -> jnp.ndarray:
    """fc1 -> GELU -> fc2 (no residual). erf-exact GELU costs ~0.6 ms/layer
    on the VPU at this width (measured: 12.75 vs 5.54 ms for the 12-layer
    MLP chain); the tanh approximation's max error (~1e-3) is below bf16
    quantization noise, so bf16 trunks use it. f32 trunks keep the exact erf
    for torch-oracle parity (reference vision_transformer.py nn.GELU)."""
    h = h @ p["fc1_kernel"].astype(h.dtype) + p["fc1_bias"].astype(h.dtype)
    h = jax.nn.gelu(h, approximate=(h.dtype == jnp.bfloat16))
    return h @ p["fc2_kernel"].astype(h.dtype) + p["fc2_bias"].astype(h.dtype)


def interpolate_pos_encoding(
    pos_embed: jnp.ndarray, h_patches: int, w_patches: int
) -> jnp.ndarray:
    """Bicubic resize of patch positional embeddings to an (h, w) patch grid.

    Matches reference interpolate_pos_encoding (vision_transformer.py:176-196):
    class token embedding passes through; patch embeddings are reshaped to the
    square training grid and bicubically resized (align_corners=False).
    """
    n = pos_embed.shape[1] - 1
    side = int(math.sqrt(n))
    if h_patches * w_patches == n and h_patches == w_patches:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, side, side, -1)
    patch_pe = interpolate(
        patch_pe, (h_patches, w_patches), method="bicubic", align_corners=False
    )
    patch_pe = patch_pe.reshape(1, h_patches * w_patches, -1)
    return jnp.concatenate([cls_pe, patch_pe], axis=1)


def _prepare_tokens(params: Dict, img: jnp.ndarray, cfg: ViTConfig,
                    dtype) -> jnp.ndarray:
    """Patchify + cls token + positional embedding
    (reference prepare_tokens, vision_transformer.py:198-209). img is NHWC."""
    b, h, w, _ = img.shape
    assert h % cfg.patch_size == 0 and w % cfg.patch_size == 0, (
        f"input {h}x{w} not divisible by patch {cfg.patch_size}"
    )
    kernel = params["patch_embed"]["kernel"].astype(dtype)
    x = jax.lax.conv_general_dilated(
        img.astype(dtype), kernel,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"].astype(dtype)
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    x = x.reshape(b, hp * wp, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    pe = interpolate_pos_encoding(params["pos_embed"], hp, wp)
    return x + pe.astype(dtype)


def vit_get_intermediate_feat(
    params: Dict,
    img: jnp.ndarray,
    cfg: ViTConfig,
    n: int = 1,
    dtype=jnp.float32,
    want_attn_qkv: bool = True,
    use_flash: bool | None = None,
    mesh=None,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
    """Normed tokens (+ attention, qkv) of the last ``n`` blocks.

    Parity target: reference ``get_intermediate_feat``
    (vision_transformer.py:225-237). The first ``depth - n`` blocks run under a
    single ``lax.scan`` over the stacked block parameters; the last ``n`` run
    individually so their attention/qkv tensors can be returned.

    Returns:
      (feats, attns, qkvs), each a list of length ``n``:
        feats[i]: (B, 1+HW, D) float32 — layernormed tokens
        attns[i]: (B, heads, N, N) attention probabilities
        qkvs[i]:  (3, B, heads, N, head_dim)
    """
    n = int(n)
    assert 1 <= n <= cfg.depth
    if use_flash is None:
        use_flash = False
    # Pallas kernels inside lax.scan hit a Mosaic compile cliff (>10 min on the
    # remote-compile tunnel); an unrolled trunk with the kernel compiles in
    # ~40 s — so flash implies unroll (CLAUDE.md perf notes).
    unroll = use_flash
    x = _prepare_tokens(params, img, cfg, dtype)
    n_scan = cfg.depth - n

    if n_scan > 0:
        if unroll:
            for i in range(n_scan):
                blk = jax.tree.map(lambda a, i=i: a[i], params["blocks"])
                x, _, _ = _block(blk, x, cfg, want_qkv=False,
                                 use_flash=use_flash, mesh=mesh)
        else:
            scan_params = jax.tree.map(lambda a: a[:n_scan], params["blocks"])

            def body(carry, blk):
                out, _, _ = _block(blk, carry, cfg, want_qkv=False,
                                   use_flash=use_flash, mesh=mesh)
                return out, None

            x, _ = jax.lax.scan(body, x, scan_params)

    feats, attns, qkvs = [], [], []
    for i in range(n_scan, cfg.depth):
        blk = jax.tree.map(lambda a, i=i: a[i], params["blocks"])
        x, attn, qkv = _block(blk, x, cfg, want_qkv=want_attn_qkv,
                              use_flash=use_flash, mesh=mesh)
        # _block_ln (kernel on the bf16 flash path) rounds to x.dtype before
        # the f32 cast exactly like the XLA form did, so this is bit-stable.
        feats.append(_block_ln(params["norm"], x, cfg.ln_eps, use_flash,
                               mesh).astype(jnp.float32))
        attns.append(attn)
        qkvs.append(qkv)
    return feats, attns, qkvs


def vit_forward_feats(params: Dict, img: jnp.ndarray, cfg: ViTConfig,
                      dtype=jnp.float32) -> jnp.ndarray:
    """All-token output after the final norm (reference forward_feats,
    vision_transformer.py:218-223)."""
    feats, _, _ = vit_get_intermediate_feat(
        params, img, cfg, n=1, dtype=dtype, want_attn_qkv=False
    )
    return feats[0]


def vit_cls_forward(params: Dict, img: jnp.ndarray, cfg: ViTConfig,
                    dtype=jnp.float32) -> jnp.ndarray:
    """CLS-token forward (reference forward, vision_transformer.py:211-216)."""
    return vit_forward_feats(params, img, cfg, dtype)[:, 0]


def vit_get_last_selfattention(params: Dict, img: jnp.ndarray, cfg: ViTConfig,
                               dtype=jnp.float32) -> jnp.ndarray:
    """Attention probabilities of the last block (reference
    get_last_selfattention, vision_transformer.py:239-246)."""
    _, attns, _ = vit_get_intermediate_feat(params, img, cfg, n=1, dtype=dtype)
    return attns[0]


def vit_get_intermediate_layers(params: Dict, img: jnp.ndarray,
                                cfg: ViTConfig, n: int = 1,
                                dtype=jnp.float32) -> List[jnp.ndarray]:
    """Normed token outputs of the last n blocks (reference
    get_intermediate_layers, vision_transformer.py:248-256)."""
    feats, _, _ = vit_get_intermediate_feat(params, img, cfg, n=n, dtype=dtype,
                                            want_attn_qkv=False)
    return feats
