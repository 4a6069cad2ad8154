"""Torch-oracle tests for the contrastive correlation loss (einsum path)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
import torch

from stego_tpu.ops.correlation import (
    CorrLossCfg,
    contrastive_correlation_loss,
    corr_loss_helper,
    sample_nonzero_locations,
)


def torch_helper(f1, f2, c1, c2, shift, pointwise, zero_clamp, stabalize):
    """The reference loss math, written directly from its definition."""
    norm = lambda t: torch.nn.functional.normalize(t, dim=1, eps=1e-10)
    corr = lambda a, b: torch.einsum("nchw,ncij->nhwij", a, b)
    fd = corr(norm(f1), norm(f2))
    if pointwise:
        old_mean = fd.mean()
        fd = fd - fd.mean(dim=[3, 4], keepdim=True)
        fd = fd - fd.mean() + old_mean
    cd = corr(norm(c1), norm(c2))
    min_val = 0.0 if zero_clamp else -9999.0
    if stabalize:
        loss = -cd.clamp(min_val, 0.8) * (fd - shift)
    else:
        loss = -cd.clamp(min=min_val) * (fd - shift)
    return loss, cd


def _nchw(rng, *shape):
    return rng.standard_normal(shape, dtype=np.float32)


@pytest.mark.parametrize("pointwise", [True, False])
@pytest.mark.parametrize("zero_clamp", [True, False])
@pytest.mark.parametrize("stabalize", [True, False])
def test_helper_matches_torch(rng, pointwise, zero_clamp, stabalize):
    f1 = _nchw(rng, 2, 6, 5, 5)
    f2 = _nchw(rng, 2, 6, 5, 5)
    c1 = _nchw(rng, 2, 3, 5, 5)
    c2 = _nchw(rng, 2, 3, 5, 5)
    shift = 0.12
    want_loss, want_cd = torch_helper(
        *map(torch.from_numpy, (f1, f2, c1, c2)), shift, pointwise, zero_clamp,
        stabalize,
    )
    cfg = CorrLossCfg(pointwise=pointwise, zero_clamp=zero_clamp,
                      stabalize=stabalize)
    to_nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    got_loss, got_cd = corr_loss_helper(
        to_nhwc(f1), to_nhwc(f2), to_nhwc(c1), to_nhwc(c2), shift, cfg
    )
    np.testing.assert_allclose(np.asarray(got_loss), want_loss.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cd), want_cd.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_full_loss_shapes_grads_determinism():
    cfg = CorrLossCfg(feature_samples=4, neg_samples=3)
    key = jr.PRNGKey(0)
    b, h, w = 4, 7, 7
    feats = jr.normal(jr.PRNGKey(1), (b, h, w, 16))
    feats_pos = jr.normal(jr.PRNGKey(2), (b, h, w, 16))
    code = jr.normal(jr.PRNGKey(3), (b, h, w, 5))
    code_pos = jr.normal(jr.PRNGKey(4), (b, h, w, 5))

    out = contrastive_correlation_loss(cfg, key, feats, feats_pos, code, code_pos)
    assert out["pos_intra_loss"].shape == ()
    assert out["neg_inter_loss"].shape[0] == 3 * b
    # deterministic under the same key
    out2 = contrastive_correlation_loss(cfg, key, feats, feats_pos, code, code_pos)
    np.testing.assert_allclose(
        float(out["pos_inter_loss"]), float(out2["pos_inter_loss"])
    )

    # gradient flows to code, not feats
    def total(c, f):
        o = contrastive_correlation_loss(cfg, key, f, feats_pos, c, code_pos)
        return (
            o["pos_intra_loss"] + o["pos_inter_loss"] + jnp.mean(o["neg_inter_loss"])
        )

    gc = jax.grad(total, argnums=0)(code, feats)
    gf = jax.grad(total, argnums=1)(code, feats)
    assert np.abs(np.asarray(gc)).sum() > 0
    assert np.abs(np.asarray(gf)).sum() == 0


def test_helper_rejects_indivisible_neg_blocks():
    # negatives_scope=local sets neg_blocks to the mesh size; a batch that
    # doesn't tile into the blocks must fail loudly at trace time, not
    # silently mis-group the per-shard pointwise fd means.
    cfg = CorrLossCfg(pointwise=True, neg_blocks=2)
    f = jr.normal(jr.PRNGKey(0), (3, 4, 4, 6))
    c = jr.normal(jr.PRNGKey(1), (3, 4, 4, 3))
    with pytest.raises(ValueError, match="not divisible by negatives blocks"):
        corr_loss_helper(f, f, c, c, 0.12, cfg)


def test_sample_nonzero_locations_respects_mask():
    t = jnp.zeros((2, 8, 8)).at[0, 2, 3].set(1.0).at[1, :, :].set(1.0)
    coords = sample_nonzero_locations(jr.PRNGKey(0), t, 50)
    assert coords.shape == (2, 50, 2)
    # image 0 has a single nonzero at (y=2, x=3): coords all equal
    x = np.asarray(coords[0, :, 0])
    y = np.asarray(coords[0, :, 1])
    np.testing.assert_allclose(x, (3 / 8) * 2 - 1, atol=1e-6)
    np.testing.assert_allclose(y, (2 / 8) * 2 - 1, atol=1e-6)
    assert np.all(np.abs(np.asarray(coords[1])) <= 1.0)


def test_crf_loss_matches_torch(rng):
    from stego_tpu.ops.crf_loss import CRFLossCfg, contrastive_crf_loss

    b, h, w, k, s = 2, 9, 9, 4, 17
    guidance = _nchw(rng, b, 3, h, w)
    clusters = _nchw(rng, b, k, h, w)
    ys = rng.integers(0, h, s)
    xs = rng.integers(0, w, s)

    # torch oracle straight from the kernel definition (src/modules.py:449-469)
    g_t = torch.from_numpy(guidance)
    c_t = torch.from_numpy(clusters)
    coords_t = torch.stack([torch.from_numpy(ys), torch.from_numpy(xs)], 0)
    sel_g = g_t[:, :, coords_t[0], coords_t[1]]
    coord_diff = (coords_t.unsqueeze(-1) - coords_t.unsqueeze(1)).square().sum(0)
    g_diff = (sel_g.unsqueeze(-1) - sel_g.unsqueeze(2)).square().sum(1)
    cfg = CRFLossCfg(n_samples=s)
    kern = (
        cfg.w1 * torch.exp(-coord_diff / (2 * cfg.alpha) - g_diff / (2 * cfg.beta))
        + cfg.w2 * torch.exp(-coord_diff / (2 * cfg.gamma))
        - cfg.shift
    )
    sel_c = c_t[:, :, coords_t[0], coords_t[1]]
    sims = torch.einsum("nka,nkb->nab", sel_c, sel_c)
    want = -(sims * kern)

    got = contrastive_crf_loss(
        cfg, jr.PRNGKey(0),
        jnp.asarray(guidance.transpose(0, 2, 3, 1)),
        jnp.asarray(clusters.transpose(0, 2, 3, 1)),
        coords=(jnp.asarray(ys), jnp.asarray(xs)),
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)
