"""Golden-parity tests: the JAX ViT vs a minimal torch oracle built directly
from the standard timm/DINO ViT math (layer_norm -> qkv attention -> mlp,
pre-LN residuals, bicubic pos-embed interpolation)."""

import math

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stego_tpu.models.convert import vit_params_from_torch
from stego_tpu.models.vit import ViTConfig, init_vit_params, vit_get_intermediate_feat

DEPTH, HEADS, DIM, PATCH, IMG = 3, 4, 32, 4, 16
EPS = 1e-6


def make_torch_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    d, m = DIM, DIM * 4
    n_tok = (IMG // PATCH) ** 2 + 1

    def r(*s):
        return torch.randn(*s, generator=g) * 0.05

    sd = {
        "patch_embed.proj.weight": r(d, 3, PATCH, PATCH),
        "patch_embed.proj.bias": r(d),
        "cls_token": r(1, 1, d),
        "pos_embed": r(1, n_tok, d),
        "norm.weight": 1 + 0.1 * r(d),
        "norm.bias": r(d),
    }
    for i in range(DEPTH):
        sd.update({
            f"blocks.{i}.norm1.weight": 1 + 0.1 * r(d),
            f"blocks.{i}.norm1.bias": r(d),
            f"blocks.{i}.attn.qkv.weight": r(3 * d, d),
            f"blocks.{i}.attn.qkv.bias": r(3 * d),
            f"blocks.{i}.attn.proj.weight": r(d, d),
            f"blocks.{i}.attn.proj.bias": r(d),
            f"blocks.{i}.norm2.weight": 1 + 0.1 * r(d),
            f"blocks.{i}.norm2.bias": r(d),
            f"blocks.{i}.mlp.fc1.weight": r(m, d),
            f"blocks.{i}.mlp.fc1.bias": r(m),
            f"blocks.{i}.mlp.fc2.weight": r(d, m),
            f"blocks.{i}.mlp.fc2.bias": r(d),
        })
    return sd


def torch_oracle_intermediate_feat(sd, x, n=1):
    """Functional torch forward implementing the ViT math directly."""
    d = DIM
    hd = d // HEADS
    x = F.conv2d(x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
                 stride=PATCH)
    b, _, hp, wp = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([sd["cls_token"].expand(b, -1, -1), x], dim=1)

    n_pe = sd["pos_embed"].shape[1] - 1
    side = int(math.sqrt(n_pe))
    if hp * wp == n_pe and hp == wp:
        pos = sd["pos_embed"]
    else:
        cls_pe = sd["pos_embed"][:, :1]
        patch_pe = sd["pos_embed"][:, 1:].reshape(1, side, side, d).permute(0, 3, 1, 2)
        patch_pe = F.interpolate(patch_pe, size=(hp, wp), mode="bicubic",
                                 align_corners=False)
        patch_pe = patch_pe.permute(0, 2, 3, 1).reshape(1, -1, d)
        pos = torch.cat([cls_pe, patch_pe], dim=1)
    x = x + pos

    feats, qkvs = [], []
    n_tok = x.shape[1]
    for i in range(DEPTH):
        xn = F.layer_norm(x, (d,), sd[f"blocks.{i}.norm1.weight"],
                          sd[f"blocks.{i}.norm1.bias"], EPS)
        qkv = F.linear(xn, sd[f"blocks.{i}.attn.qkv.weight"],
                       sd[f"blocks.{i}.attn.qkv.bias"])
        qkv = qkv.reshape(b, n_tok, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1) * hd**-0.5).softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n_tok, d)
        y = F.linear(y, sd[f"blocks.{i}.attn.proj.weight"],
                     sd[f"blocks.{i}.attn.proj.bias"])
        x = x + y
        xn2 = F.layer_norm(x, (d,), sd[f"blocks.{i}.norm2.weight"],
                           sd[f"blocks.{i}.norm2.bias"], EPS)
        h = F.linear(xn2, sd[f"blocks.{i}.mlp.fc1.weight"],
                     sd[f"blocks.{i}.mlp.fc1.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[f"blocks.{i}.mlp.fc2.weight"],
                     sd[f"blocks.{i}.mlp.fc2.bias"])
        x = x + h
        if DEPTH - i <= n:
            feats.append(F.layer_norm(x, (d,), sd["norm.weight"], sd["norm.bias"],
                                      EPS))
            qkvs.append(qkv)
    return feats, qkvs


CFG = ViTConfig(patch_size=PATCH, embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
                img_size=IMG)


@pytest.mark.parametrize("hw", [(16, 16), (16, 24), (32, 20)])
def test_vit_matches_torch_oracle(hw):
    sd = make_torch_sd()
    params = vit_params_from_torch(sd, CFG)
    x = torch.randn(2, 3, *hw, generator=torch.Generator().manual_seed(1))
    want_feats, want_qkvs = torch_oracle_intermediate_feat(sd, x, n=1)
    img = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    feats, attns, qkvs = vit_get_intermediate_feat(params, img, CFG, n=1)
    np.testing.assert_allclose(
        np.asarray(feats[0]), want_feats[0].numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(qkvs[0]), want_qkvs[0].numpy(), rtol=2e-4, atol=2e-5
    )


def test_vit_last_n_blocks():
    sd = make_torch_sd()
    params = vit_params_from_torch(sd, CFG)
    x = torch.randn(1, 3, IMG, IMG, generator=torch.Generator().manual_seed(2))
    want_feats, _ = torch_oracle_intermediate_feat(sd, x, n=2)
    img = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    feats, _, _ = vit_get_intermediate_feat(params, img, CFG, n=2)
    assert len(feats) == 2
    for got, want in zip(feats, want_feats):
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                                   atol=2e-5)


def test_init_shapes_and_scan_runs():
    params = init_vit_params(jr.PRNGKey(0), CFG)
    img = jnp.zeros((1, IMG, IMG, 3))
    feats, attns, qkvs = vit_get_intermediate_feat(params, img, CFG, n=1)
    n_tok = (IMG // PATCH) ** 2 + 1
    assert feats[0].shape == (1, n_tok, DIM)
    assert attns[0].shape == (1, HEADS, n_tok, n_tok)
    assert qkvs[0].shape == (3, 1, HEADS, n_tok, DIM // HEADS)


def test_cast_params_for_compute_bitwise_identical():
    """bf16 storage for the block matmul weights is a pure storage change:
    a bf16 trunk produces BITWISE-identical features whether the weights are
    stored f32 (converted per step) or pre-cast once (round-5 lever —
    the ViT-B profile charged ~0.26 ms/step per converted weight stack)."""
    import jax
    import jax.numpy as jnp

    from stego_tpu.models.vit import (ViTConfig, cast_params_for_compute,
                                      init_vit_params,
                                      vit_get_intermediate_feat)

    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=3, num_heads=4,
                    img_size=16)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    cast = cast_params_for_compute(params, jnp.bfloat16)
    # only the block matmul weights changed dtype
    assert cast["blocks"]["attn"]["qkv_kernel"].dtype == jnp.bfloat16
    assert cast["blocks"]["mlp"]["fc1_kernel"].dtype == jnp.bfloat16
    assert cast["blocks"]["norm1"]["scale"].dtype == jnp.float32
    assert cast["pos_embed"].dtype == jnp.float32

    img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    f_a, _, _ = vit_get_intermediate_feat(params, img, cfg,
                                          dtype=jnp.bfloat16)
    f_b, _, _ = vit_get_intermediate_feat(cast, img, cfg,
                                          dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(f_a[0], np.float32),
                                  np.asarray(f_b[0], np.float32))
    # f32 dtype / non-ViT pytrees: no-op passthrough
    assert cast_params_for_compute(params, jnp.float32) is params
    assert cast_params_for_compute({"conv1": 0}, jnp.bfloat16) == {"conv1": 0}
