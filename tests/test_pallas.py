"""Fused Pallas correspondence loss vs the einsum oracle (fwd + grad).

Runs in interpreter mode on the CPU test mesh; the same kernel compiles on TPU
(exercised by bench/e2e scripts on hardware).
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from stego_tpu.ops.correlation import CorrLossCfg, corr_loss_helper
from stego_tpu.ops.pallas_corr import (fused_correlation_loss,
                                        fused_correlation_loss_multi)


def _data(key, b=2, h=5, w=5, cf=12, cc=7):
    k1, k2, k3, k4 = jr.split(key, 4)
    return (
        jr.normal(k1, (b, h, w, cf)),
        jr.normal(k2, (b, h, w, cf)),
        jr.normal(k3, (b, h, w, cc)),
        jr.normal(k4, (b, h, w, cc)),
    )


def oracle(f1, f2, c1, c2, shift, cfg):
    loss, cd = corr_loss_helper(f1, f2, c1, c2, shift, cfg)
    return jnp.mean(loss), jnp.mean(cd)


@pytest.mark.parametrize("pointwise", [True, False])
@pytest.mark.parametrize("zero_clamp", [True, False])
@pytest.mark.parametrize("stabalize", [True, False])
def test_fused_forward_matches_oracle(pointwise, zero_clamp, stabalize):
    f1, f2, c1, c2 = _data(jr.PRNGKey(0))
    cfg = CorrLossCfg(pointwise=pointwise, zero_clamp=zero_clamp,
                      stabalize=stabalize)
    shift = 0.17
    want_loss, want_cd = oracle(f1, f2, c1, c2, shift, cfg)
    got_loss, got_cd = fused_correlation_loss(
        f1, f2, c1, c2, shift, pointwise=pointwise, zero_clamp=zero_clamp,
        stabalize=stabalize, interpret=True,
    )
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(got_cd), float(want_cd), rtol=2e-5,
                               atol=1e-6)


def test_fused_code_bf16_tolerance():
    """pallas_loss_bf16: code tiles (and backward coefficients) drop to bf16
    inside the kernels. The TOLERANCE STORY for the opt-in flag: loss within
    1% of the f32 oracle, gradients aligned to >0.995 cosine (measured
    ~0.9985 — bf16's 8-bit mantissa) with <2% norm error. (Entries where the
    bf16 cd rounds across the clamp boundary can differ elementwise — the
    aggregate bounds are the contract.)"""
    f1, f2, c1, c2 = _data(jr.PRNGKey(7), b=2, h=8, w=8, cf=12, cc=7)
    cfg = CorrLossCfg(pointwise=True)
    shift = 0.12

    def loss_oracle(c1, c2):
        return oracle(f1, f2, c1, c2, shift, cfg)[0]

    def loss_bf16(c1, c2):
        return fused_correlation_loss(f1, f2, c1, c2, shift,
                                      interpret=True, code_bf16=True)[0]

    want = float(loss_oracle(c1, c2))
    got = float(loss_bf16(c1, c2))
    assert abs(got - want) <= max(1e-2 * abs(want), 5e-4)

    g_want = jax.grad(loss_oracle, argnums=(0, 1))(c1, c2)
    g_got = jax.grad(loss_bf16, argnums=(0, 1))(c1, c2)
    for a, b in zip(g_want, g_got):
        assert b.dtype == jnp.float32  # grads stay f32 (kernel-internal cast)
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        assert np.dot(a, b) / (na * nb) > 0.995
        assert abs(nb - na) / na < 2e-2


@pytest.mark.parametrize("pointwise", [True, False])
def test_fused_grad_matches_oracle(pointwise):
    f1, f2, c1, c2 = _data(jr.PRNGKey(1))
    cfg = CorrLossCfg(pointwise=pointwise)
    shift = 0.12

    def loss_oracle(c1, c2):
        return oracle(f1, f2, c1, c2, shift, cfg)[0]

    def loss_fused(c1, c2):
        return fused_correlation_loss(f1, f2, c1, c2, shift,
                                      pointwise=pointwise, interpret=True)[0]

    g1_want, g2_want = jax.grad(loss_oracle, argnums=(0, 1))(c1, c2)
    g1_got, g2_got = jax.grad(loss_fused, argnums=(0, 1))(c1, c2)
    np.testing.assert_allclose(np.asarray(g1_got), np.asarray(g1_want),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2_got), np.asarray(g2_want),
                               rtol=2e-4, atol=1e-6)


def test_fused_grad_does_not_flow_to_features():
    f1, f2, c1, c2 = _data(jr.PRNGKey(2))

    def loss(f1, f2):
        return fused_correlation_loss(f1, f2, c1, c2, 0.1, interpret=True)[0]

    g1, g2 = jax.grad(loss, argnums=(0, 1))(f1, f2)
    assert float(jnp.abs(g1).sum()) == 0.0
    assert float(jnp.abs(g2).sum()) == 0.0


def test_fused_multi_tile():
    # spatial size crossing the 128 tile boundary (h*w = 17*9 = 153 -> 2 tiles)
    f1, f2, c1, c2 = _data(jr.PRNGKey(3), b=1, h=17, w=9, cf=6, cc=5)
    cfg = CorrLossCfg()
    want_loss, want_cd = oracle(f1, f2, c1, c2, 0.2, cfg)
    got_loss, got_cd = fused_correlation_loss(f1, f2, c1, c2, 0.2,
                                              interpret=True)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(got_cd), float(want_cd), rtol=2e-5,
                               atol=1e-6)

    def lf(c1):
        return fused_correlation_loss(f1, f2, c1, c2, 0.2, interpret=True)[0]

    def lo(c1):
        return oracle(f1, f2, c1, c2, 0.2, cfg)[0]

    np.testing.assert_allclose(
        np.asarray(jax.grad(lf)(c1)), np.asarray(jax.grad(lo)(c1)),
        rtol=2e-4, atol=1e-6,
    )


def test_fused_cd_mean_gradient():
    """cd_mean output carries its own gradient (used only for logging in the
    train step, but the VJP must still be exact)."""
    f1, f2, c1, c2 = _data(jr.PRNGKey(4))
    cfg = CorrLossCfg()

    def both_fused(c1):
        loss, cdm = fused_correlation_loss(f1, f2, c1, c2, 0.1, interpret=True)
        return loss + 3.0 * cdm

    def both_oracle(c1):
        loss, cdm = oracle(f1, f2, c1, c2, 0.1, cfg)
        return loss + 3.0 * cdm

    np.testing.assert_allclose(
        np.asarray(jax.grad(both_fused)(c1)),
        np.asarray(jax.grad(both_oracle)(c1)),
        rtol=2e-4, atol=1e-6,
    )


def test_fused_three_pair_wrapper_matches_einsum_stats():
    """The fused three-pair wrapper must produce the same pos-pair losses as
    the einsum path under identical keys (identical coordinate draws)."""
    from stego_tpu.ops.correlation import contrastive_correlation_loss
    from stego_tpu.ops.pallas_corr import contrastive_correlation_loss_fused

    cfg = CorrLossCfg(feature_samples=4, neg_samples=2)
    key = jr.PRNGKey(7)
    b = 3
    feats = jr.normal(jr.PRNGKey(1), (b, 6, 6, 10))
    feats_pos = jr.normal(jr.PRNGKey(2), (b, 6, 6, 10))
    code = jr.normal(jr.PRNGKey(3), (b, 6, 6, 5))
    code_pos = jr.normal(jr.PRNGKey(4), (b, 6, 6, 5))

    ref = contrastive_correlation_loss(cfg, key, feats, feats_pos, code,
                                       code_pos)
    got = contrastive_correlation_loss_fused(cfg, key, feats, feats_pos, code,
                                             code_pos, interpret=True)
    np.testing.assert_allclose(float(got["pos_intra_loss"]),
                               float(ref["pos_intra_loss"]), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(got["pos_inter_loss"]),
                               float(ref["pos_inter_loss"]), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(got["neg_inter_loss"]),
                               float(jnp.mean(ref["neg_inter_loss"])),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(got["pos_intra_cd"]),
                               float(jnp.mean(ref["pos_intra_cd"])),
                               rtol=2e-5, atol=1e-6)


def test_fused_matmul_sampling_matches_gather_sampling():
    """The shared-weight-matrix sampling branch (sampling_impl='matmul', the
    TPU default in the cached step) must reproduce the gather branch: same
    coordinate draws, same negatives batching, same losses and code grads."""
    from stego_tpu.ops.pallas_corr import contrastive_correlation_loss_fused

    cfg = CorrLossCfg(feature_samples=4, neg_samples=3)
    key = jr.PRNGKey(9)
    b = 3
    feats = jr.normal(jr.PRNGKey(1), (b, 6, 6, 10))
    feats_pos = jr.normal(jr.PRNGKey(2), (b, 6, 6, 10))
    code = jr.normal(jr.PRNGKey(3), (b, 6, 6, 5))
    code_pos = jr.normal(jr.PRNGKey(4), (b, 6, 6, 5))

    def run(impl, c):
        out = contrastive_correlation_loss_fused(
            cfg, key, feats, feats_pos, c, code_pos, interpret=True,
            sampling_impl=impl)
        return (out["pos_intra_loss"] + out["pos_inter_loss"]
                + jnp.mean(out["neg_inter_loss"]))

    v_g, g_g = jax.value_and_grad(lambda c: run("gather", c))(code)
    v_m, g_m = jax.value_and_grad(lambda c: run("matmul", c))(code)
    np.testing.assert_allclose(float(v_m), float(v_g), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_g),
                               rtol=1e-4, atol=1e-6)


def test_full_field_mode_runs_with_grads():
    from stego_tpu.ops.pallas_corr import contrastive_correlation_loss_fused

    cfg = CorrLossCfg(neg_samples=2)
    feats = jr.normal(jr.PRNGKey(1), (2, 7, 7, 10))
    code = jr.normal(jr.PRNGKey(3), (2, 7, 7, 5))

    def loss(code):
        out = contrastive_correlation_loss_fused(
            cfg, jr.PRNGKey(0), feats, feats, code, code, full_field=True,
            interpret=True)
        return out["pos_inter_loss"] + out["neg_inter_loss"]

    g = jax.grad(loss)(code)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_multi_group_matches_per_pair_calls():
    """One multi-group launch must equal separate single-pair fused calls
    (and hence the einsum oracle) including grads."""
    from stego_tpu.ops.pallas_corr import (
        fused_correlation_loss,
        fused_correlation_loss_multi,
    )

    f1, f2, c1, c2 = _data(jr.PRNGKey(5), b=2)
    f3, f4, c3, c4 = _data(jr.PRNGKey(6), b=3)  # different group size

    def multi(c1, c3):
        losses, cds = fused_correlation_loss_multi(
            [(f1, f2, c1, c2), (f3, f4, c3, c4)], [0.1, 0.4], interpret=True)
        return losses, cds

    (losses, cds) = multi(c1, c3)
    l1, cd1 = fused_correlation_loss(f1, f2, c1, c2, 0.1, interpret=True)
    l2, cd2 = fused_correlation_loss(f3, f4, c3, c4, 0.4, interpret=True)
    np.testing.assert_allclose(float(losses[0]), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(losses[1]), float(l2), rtol=1e-5)
    np.testing.assert_allclose(float(cds[0]), float(cd1), rtol=1e-5)
    np.testing.assert_allclose(float(cds[1]), float(cd2), rtol=1e-5)

    def total_multi(c1, c3):
        losses, _ = multi(c1, c3)
        return 2.0 * losses[0] + 3.0 * losses[1]

    def total_single(c1, c3):
        return (2.0 * fused_correlation_loss(f1, f2, c1, c2, 0.1,
                                             interpret=True)[0]
                + 3.0 * fused_correlation_loss(f3, f4, c3, c4, 0.4,
                                               interpret=True)[0])

    g_multi = jax.grad(total_multi, argnums=(0, 1))(c1, c3)
    g_single = jax.grad(total_single, argnums=(0, 1))(c1, c3)
    for gm, gs in zip(g_multi, g_single):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gs), rtol=2e-4,
                                   atol=1e-6)


def test_fused_salience_matches_einsum_oracle():
    """Salience-biased coordinate draws must behave identically in the fused
    path (reference modules.py:355-364; round-1 gap: fused silently ignored
    salience)."""
    from stego_tpu.ops.correlation import contrastive_correlation_loss
    from stego_tpu.ops.pallas_corr import contrastive_correlation_loss_fused

    cfg = CorrLossCfg(feature_samples=4, neg_samples=2, use_salience=True)
    key = jr.PRNGKey(11)
    b = 3
    feats = jr.normal(jr.PRNGKey(1), (b, 6, 6, 10))
    feats_pos = jr.normal(jr.PRNGKey(2), (b, 6, 6, 10))
    code = jr.normal(jr.PRNGKey(3), (b, 6, 6, 5))
    code_pos = jr.normal(jr.PRNGKey(4), (b, 6, 6, 5))
    sal = (jr.uniform(jr.PRNGKey(5), (b, 6, 6)) > 0.6).astype(jnp.float32)
    sal_pos = (jr.uniform(jr.PRNGKey(6), (b, 6, 6)) > 0.6).astype(jnp.float32)

    ref = contrastive_correlation_loss(cfg, key, feats, feats_pos, code,
                                       code_pos, sal, sal_pos)
    got = contrastive_correlation_loss_fused(cfg, key, feats, feats_pos, code,
                                             code_pos, sal, sal_pos,
                                             interpret=True)
    for k in ("pos_intra_loss", "pos_inter_loss"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=2e-5,
                                   atol=1e-6)
    # negatives: salience-biased draws repeat the few nonzero locations, so
    # correspondence rows are highly correlated and the fused kernel's
    # streamed f32 closed-form (big_s1 - rowterm + ...) loses ~1e-4 relative
    # to the oracle's direct mean — precision, not semantics
    np.testing.assert_allclose(float(got["neg_inter_loss"]),
                               float(jnp.mean(ref["neg_inter_loss"])),
                               rtol=1e-3, atol=1e-6)

    # a different salience mask must change the fused result (i.e. salience is
    # actually consumed, not dropped)
    got2 = contrastive_correlation_loss_fused(
        cfg, key, feats, feats_pos, code, code_pos,
        jnp.ones_like(sal), jnp.ones_like(sal_pos), interpret=True)
    assert float(got2["pos_intra_loss"]) != float(got["pos_intra_loss"])


def test_fused_salience_full_field_raises():
    from stego_tpu.ops.pallas_corr import contrastive_correlation_loss_fused

    cfg = CorrLossCfg(use_salience=True)
    b = 2
    feats = jr.normal(jr.PRNGKey(1), (b, 4, 4, 6))
    code = jr.normal(jr.PRNGKey(2), (b, 4, 4, 3))
    sal = jnp.ones((b, 4, 4))
    import pytest
    with pytest.raises(ValueError, match="full_field"):
        contrastive_correlation_loss_fused(
            cfg, jr.PRNGKey(0), feats, feats, code, code, sal, sal,
            full_field=True, interpret=True)


def test_fused_loss_bf16_feat_tiles_close_to_f32():
    """feat_dtype=bfloat16 (the bf16-trunk production setting) must track the
    f32 kernel within bf16 matmul noise — fd is stop-gradient, so only the
    loss VALUE moves, not the gradient path's structure."""
    import jax

    rng = np.random.default_rng(11)
    shp = (2, 8, 8, 16)
    f1 = jnp.asarray(rng.standard_normal(shp, dtype=np.float32))
    f2 = jnp.asarray(rng.standard_normal(shp, dtype=np.float32))
    c1 = jnp.asarray(rng.standard_normal((2, 8, 8, 6), dtype=np.float32))
    c2 = jnp.asarray(rng.standard_normal((2, 8, 8, 6), dtype=np.float32))

    def loss(c1_, dtype):
        losses, _ = fused_correlation_loss_multi(
            [(f1, f2, c1_, c2)], [0.3], feat_dtype=dtype)
        return losses[0]

    l32, g32 = jax.value_and_grad(lambda c: loss(c, jnp.float32))(c1)
    l16, g16 = jax.value_and_grad(lambda c: loss(c, jnp.bfloat16))(c1)
    np.testing.assert_allclose(float(l16), float(l32), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               rtol=5e-2, atol=5e-3)
