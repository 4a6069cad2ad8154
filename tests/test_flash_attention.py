"""Flash attention vs standard attention (interpret mode)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from stego_tpu.ops.flash_attention import flash_attention


def standard(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


@pytest.mark.parametrize("n", [17, 128, 200])
def test_flash_matches_standard(n):
    b, h, d = 2, 3, 32
    q = jr.normal(jr.PRNGKey(0), (b, h, n, d))
    k = jr.normal(jr.PRNGKey(1), (b, h, n, d))
    v = jr.normal(jr.PRNGKey(2), (b, h, n, d))
    scale = d**-0.5
    want = standard(q, k, v, scale)
    got = flash_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_vit_flash_equals_standard_interpret():
    from stego_tpu.models.vit import ViTConfig, init_vit_params, \
        vit_get_intermediate_feat

    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=3, num_heads=4,
                    img_size=16)
    params = init_vit_params(jr.PRNGKey(0), cfg)
    img = jr.normal(jr.PRNGKey(1), (2, 16, 16, 3))
    f_std, _, _ = vit_get_intermediate_feat(params, img, cfg, use_flash=False)
    # interpret-mode flash on CPU (forced through the use_flash flag)
    import stego_tpu.ops.flash_attention as fa
    f_fla, _, _ = vit_get_intermediate_feat(params, img, cfg, use_flash=True)
    np.testing.assert_allclose(np.asarray(f_fla[0]), np.asarray(f_std[0]),
                               rtol=1e-4, atol=1e-5)


def test_resident_attention_matches_standard():
    from stego_tpu.ops.flash_attention import resident_attention

    b, h, n, d = 2, 3, 150, 32
    q = jr.normal(jr.PRNGKey(0), (b, h, n, d))
    k = jr.normal(jr.PRNGKey(1), (b, h, n, d))
    v = jr.normal(jr.PRNGKey(2), (b, h, n, d))
    scale = d**-0.5
    want = standard(q, k, v, scale)
    got = resident_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_packed_attention_matches_standard():
    """Packed token-major kernel (qkv in (B, N, 3, H*d), two heads per grid
    step) must match the head-major einsum oracle."""
    from stego_tpu.ops.flash_attention import packed_attention

    b, h, n, d = 2, 4, 150, 64
    q = jr.normal(jr.PRNGKey(0), (b, h, n, d))
    k = jr.normal(jr.PRNGKey(1), (b, h, n, d))
    v = jr.normal(jr.PRNGKey(2), (b, h, n, d))
    scale = d**-0.5
    want = standard(q, k, v, scale)  # (b, h, n, d)
    # pack in DINO qkv-projection layout: [q|k|v] x [head] x [dim]
    packed = jnp.stack(
        [t.transpose(0, 2, 1, 3).reshape(b, n, h * d) for t in (q, k, v)],
        axis=2,
    )  # (b, n, 3, h*d)
    got = packed_attention(packed, h, scale, interpret=True)
    want_tok = want.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_tok),
                               rtol=2e-5, atol=2e-5)


def test_vit_packed_flash_equals_standard():
    """ViT with head_dim=64 and even heads routes the trunk through the
    packed kernel; features must match the einsum trunk."""
    from stego_tpu.models.vit import ViTConfig, init_vit_params, \
        vit_get_intermediate_feat

    cfg = ViTConfig(patch_size=4, embed_dim=128, depth=2, num_heads=2,
                    img_size=16)
    params = init_vit_params(jr.PRNGKey(0), cfg)
    img = jr.normal(jr.PRNGKey(1), (2, 16, 16, 3))
    f_std, _, _ = vit_get_intermediate_feat(params, img, cfg, use_flash=False)
    f_pack, _, _ = vit_get_intermediate_feat(params, img, cfg, use_flash=True)
    np.testing.assert_allclose(np.asarray(f_pack[0]), np.asarray(f_std[0]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [100, 600])
def test_kv_resident_matches_standard(n):
    """kv-resident kernel (whole K/V per (b,h) in VMEM, 512-row query tiles)
    vs einsum oracle, incl. n smaller than one query tile and n needing
    row/col padding."""
    from stego_tpu.ops.flash_attention import kv_resident_attention

    b, h, d = 2, 2, 64
    q = jr.normal(jr.PRNGKey(0), (b, h, n, d))
    k = jr.normal(jr.PRNGKey(1), (b, h, n, d))
    v = jr.normal(jr.PRNGKey(2), (b, h, n, d))
    scale = d**-0.5
    want = standard(q, k, v, scale)
    got = kv_resident_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_trunk_attention_vmem_bound_falls_back_to_einsum():
    """Beyond KV_RESIDENT_MAX_N the kv-resident kernel's (512, N_pad) logits
    tile would blow VMEM; trunk_attention must return None so the caller's
    einsum path runs (graceful fallback instead of a compile-time OOM)."""
    import jax.numpy as jnp

    from stego_tpu.ops.flash_attention import KV_RESIDENT_MAX_N, trunk_attention

    n = KV_RESIDENT_MAX_N + 128
    q = jnp.zeros((1, 1, n, 8))
    assert trunk_attention(q, q, q, 0.125) is None


def test_trunk_attention_vmem_dispatch():
    """ViT-S shapes fit the batch-resident (all heads per step) budget;
    ViT-B's 12 bf16 heads at N_pad=896 do not (measured 16.91 MiB vs the
    16 MiB scoped limit on v5e) and must route to the per-(batch, head)
    resident kernel instead of OOMing at compile."""
    from stego_tpu.ops.flash_attention import _batch_resident_fits

    assert _batch_resident_fits(6, 896, 64, 2)        # ViT-S/8 res 224 bf16
    assert not _batch_resident_fits(12, 896, 64, 2)   # ViT-B/8 res 224 bf16
    assert _batch_resident_fits(4, 128, 8, 4)         # tiny test configs


def test_resident_attention_matches_einsum_vit_b_headcount():
    """The per-(batch, head) resident kernel (ViT-B's dispatch target) must
    match the einsum oracle."""
    import jax
    import jax.numpy as jnp

    from stego_tpu.ops.flash_attention import resident_attention

    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 12, 33, 16)), jnp.float32)
               for _ in range(3))
    scale = 0.25
    got = jax.jit(lambda q, k, v: resident_attention(q, k, v, scale,
                                                     interpret=True))(q, k, v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_batch_resident_heads_per_step_matches_full():
    """The head-sliced batch-resident variant (ViT-B dispatch) must equal
    the all-heads kernel and the einsum oracle."""
    import jax
    import jax.numpy as jnp

    from stego_tpu.ops.flash_attention import batch_resident_attention

    rng = np.random.default_rng(6)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 12, 33, 16)), jnp.float32)
               for _ in range(3))
    scale = 0.25
    full = jax.jit(lambda q, k, v: batch_resident_attention(
        q, k, v, scale, interpret=True))(q, k, v)
    sliced = jax.jit(lambda q, k, v: batch_resident_attention(
        q, k, v, scale, interpret=True, heads_per_step=6))(q, k, v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(sliced), np.asarray(full), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sliced), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("h", [2, 6, 12])
def test_pair_attention_matches_standard(h):
    """Token-major pair kernel (2 heads per native 128-lane block slice) vs
    the einsum oracle, head counts spanning ViT-S (6) and ViT-B (12)."""
    from stego_tpu.ops.flash_attention import pair_attention

    b, n, d = 2, 150, 64
    key = jr.PRNGKey(0)
    q = jr.normal(jr.fold_in(key, 1), (b, n, h * d))
    k = jr.normal(jr.fold_in(key, 2), (b, n, h * d))
    v = jr.normal(jr.fold_in(key, 3), (b, n, h * d))
    scale = d**-0.5

    def to_heads(t):
        return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)

    want = standard(to_heads(q), to_heads(k), to_heads(v), scale)
    want = want.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    got = pair_attention(q, k, v, h, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_use_pair_attention_predicate():
    from stego_tpu.ops.flash_attention import use_pair_attention

    assert use_pair_attention(12, 64, 785)    # ViT-B/8 res 224
    assert use_pair_attention(6, 64, 785)     # ViT-S/8 res 224
    assert use_pair_attention(6, 64, 1025)    # res 256 (n_pad 1152)
    assert use_pair_attention(6, 64, 3137)    # res 448 (round 5: kv-resident
    #                                           pair kernel extends the
    #                                           token-major path past 1152)
    assert not use_pair_attention(3, 64, 785)   # vit_tiny: odd head count
    assert not use_pair_attention(4, 32, 785)   # head_dim != 64


def test_vit_pair_dispatch_equals_standard():
    """A ViT config hitting the token-major pair fast path (head_dim 64,
    even heads, moderate N) must match the einsum trunk."""
    from stego_tpu.models.vit import ViTConfig, init_vit_params, \
        vit_get_intermediate_feat

    cfg = ViTConfig(patch_size=4, embed_dim=128, depth=2, num_heads=2,
                    img_size=16)
    params = init_vit_params(jr.PRNGKey(0), cfg)
    img = jr.normal(jr.PRNGKey(1), (2, 16, 16, 3))
    f_std, _, _ = vit_get_intermediate_feat(params, img, cfg, use_flash=False)
    f_par, _, _ = vit_get_intermediate_feat(params, img, cfg, use_flash=True)
    np.testing.assert_allclose(np.asarray(f_par[0]), np.asarray(f_std[0]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("h,n", [(2, 300), (6, 1300)])
def test_pair_kv_attention_matches_standard(h, n):
    """Round-5 token-major kv-resident pair kernel (long-N regime: head-pair
    K/V resident, TQ_PAIR query row tiles) vs the einsum oracle. n=1300
    exceeds RESIDENT_MAX_N (the res-320 eval case) and is NOT a TQ_PAIR
    multiple, exercising the q padding."""
    from stego_tpu.ops.flash_attention import pair_kv_attention

    b, d = 2, 64
    key = jr.PRNGKey(0)
    q = jr.normal(jr.fold_in(key, 1), (b, n, h * d))
    k = jr.normal(jr.fold_in(key, 2), (b, n, h * d))
    v = jr.normal(jr.fold_in(key, 3), (b, n, h * d))
    scale = d**-0.5

    def to_heads(t):
        return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)

    want = standard(to_heads(q), to_heads(k), to_heads(v), scale)
    want = want.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    got = pair_kv_attention(q, k, v, h, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_token_major_dispatch_covers_long_n():
    """use_pair_attention now accepts the res-320/448 regime (round 5) and
    token_major_attention routes by N; the >KV_RESIDENT_MAX_N and odd-head
    cases still fall back."""
    from stego_tpu.ops.flash_attention import use_pair_attention

    assert use_pair_attention(6, 64, 1601)   # res 320 eval (n_pad 1664)
    assert use_pair_attention(6, 64, 3137)   # res 448 demo (n_pad 3200)
    assert use_pair_attention(12, 64, 3137)  # ViT-B res 448
    assert not use_pair_attention(6, 64, 4200)  # beyond kv-resident budget
    assert not use_pair_attention(3, 64, 1601)  # odd head count
