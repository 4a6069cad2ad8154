import jax.numpy as jnp
import jax.random as jr
import numpy as np
import torch

from stego_tpu.models.featurizer import DinoFeaturizer, dropout2d
from stego_tpu.models.probes import (
    cluster_lookup,
    init_cluster_probe,
    init_linear_probe,
    linear_probe_logits,
)
from stego_tpu.models.vit import ViTConfig, init_vit_params

CFG = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4, img_size=16)


def test_featurizer_shapes_and_grad_isolation():
    f = DinoFeaturizer(CFG, dim=7, projection_type="nonlinear")
    backbone = init_vit_params(jr.PRNGKey(0), CFG)
    head = f.init_head(jr.PRNGKey(1))
    img = jr.normal(jr.PRNGKey(2), (2, 16, 16, 3))
    feats, code = f.apply(backbone, head, img, train=False)
    assert feats.shape == (2, 4, 4, 32)
    assert code.shape == (2, 4, 4, 7)

    # gradients flow to head only; backbone is stop_gradient'ed
    import jax

    def loss(head_p, backbone_p):
        _, c = f.apply(backbone_p, head_p, img, train=False)
        return jnp.sum(c**2)

    ghead = jax.grad(loss, argnums=0)(head, backbone)
    gback = jax.grad(loss, argnums=1)(head, backbone)
    assert np.abs(np.asarray(ghead["cluster1"]["kernel"])).sum() > 0
    assert all(
        np.abs(np.asarray(x)).sum() == 0 for x in jax.tree.leaves(gback)
    )


def test_featurizer_linear_projection():
    f = DinoFeaturizer(CFG, dim=7, projection_type="linear", use_dropout=False)
    backbone = init_vit_params(jr.PRNGKey(0), CFG)
    head = f.init_head(jr.PRNGKey(1))
    assert "cluster2" not in head
    img = jr.normal(jr.PRNGKey(2), (1, 16, 16, 3))
    feats, code = f.apply(backbone, head, img)
    # linear head == plain matmul of feats
    want = feats @ head["cluster1"]["kernel"] + head["cluster1"]["bias"]
    np.testing.assert_allclose(np.asarray(code), np.asarray(want), rtol=1e-5)


def test_dropout2d_channelwise():
    x = jnp.ones((4, 5, 5, 16))
    y = np.asarray(dropout2d(x, 0.5, jr.PRNGKey(0)))
    # each (b, c) slice is either all 0 or all 2
    per_chan = y.reshape(4, 25, 16)
    assert set(np.unique(per_chan)) <= {0.0, 2.0}
    assert (per_chan.std(axis=1) == 0).all()


def test_cluster_lookup_matches_torch():
    torch.manual_seed(0)
    x_t = torch.randn(2, 6, 3, 4)  # NCHW
    clusters = torch.randn(5, 6)
    normed_c = torch.nn.functional.normalize(clusters, dim=1)
    normed_f = torch.nn.functional.normalize(x_t, dim=1)
    ips = torch.einsum("bchw,nc->bnhw", normed_f, normed_c)
    probs_t = torch.nn.functional.one_hot(ips.argmax(1), 5).permute(0, 3, 1, 2).float()
    loss_t = -(probs_t * ips).sum(1).mean()

    params = {"clusters": jnp.asarray(clusters.numpy())}
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    loss, probs = cluster_lookup(params, x, alpha=None)
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(probs).transpose(0, 3, 1, 2), probs_t.numpy(), atol=1e-6
    )

    # alpha path: log-probs
    lp = cluster_lookup(params, x, alpha=2.0, log_probs=True)
    want_lp = torch.log_softmax(ips * 2.0, dim=1).numpy()
    np.testing.assert_allclose(
        np.asarray(lp).transpose(0, 3, 1, 2), want_lp, rtol=1e-5, atol=1e-6
    )


def test_linear_probe():
    p = init_linear_probe(jr.PRNGKey(0), 7, 3)
    x = jr.normal(jr.PRNGKey(1), (2, 4, 4, 7))
    logits = linear_probe_logits(p, x)
    assert logits.shape == (2, 4, 4, 3)


def test_cluster_probe_init():
    p = init_cluster_probe(jr.PRNGKey(0), 7, 5)
    assert p["clusters"].shape == (5, 7)


def test_featurizer_kk_feat_type():
    """feat_type='KK' uses per-head keys of the last block
    (reference modules.py:98-101)."""
    import torch

    from tests.test_vit import CFG as TCFG, make_torch_sd, \
        torch_oracle_intermediate_feat
    from stego_tpu.models.convert import vit_params_from_torch

    sd = make_torch_sd()
    params = vit_params_from_torch(sd, TCFG)
    f = DinoFeaturizer(TCFG, dim=5, feat_type="KK", projection_type="linear",
                       use_dropout=False)
    x = torch.randn(2, 3, 16, 16, generator=torch.Generator().manual_seed(3))
    img = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    feats = f.backbone_features(params, img)
    assert feats.shape == (2, 4, 4, 32)

    # oracle: keys of last block, cls dropped; channel = (head, head_dim)
    # head-major, matching the reference's permute/reshape (modules.py:99-101)
    _, qkvs = torch_oracle_intermediate_feat(sd, x, n=1)
    k = qkvs[0][1][:, :, 1:, :]  # (B, H, N-1, hd)
    b, h, n, hd = k.shape
    want = k.permute(0, 2, 1, 3).reshape(b, n, h * hd) \
        .reshape(b, 4, 4, h * hd).numpy()
    np.testing.assert_allclose(np.asarray(feats), want, rtol=2e-4, atol=2e-5)
