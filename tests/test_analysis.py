"""Tests for analysis figures: correspondence heatmaps (torch oracle),
PR-curve machinery, train_crf experiment."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import torch
import torch.nn.functional as F

from stego_tpu.config import Config
from stego_tpu.eval.analysis import (
    correspondence_heatmaps,
    interpolated_query_path,
    label_agreement_fd,
    plot_pr_curves,
    pr_curve_data,
)
from stego_tpu.train.crf_app import rgb_to_normed_lab, train_crf_codes


def test_correspondence_heatmaps_match_torch_oracle(rng):
    feats = rng.standard_normal((1, 6, 28, 28), dtype=np.float32)  # NCHW
    feats2 = rng.standard_normal((1, 6, 28, 28), dtype=np.float32)
    qp = np.array([[-0.1, 0.0], [0.5, 0.8]], np.float32).reshape(1, 2, 1, 2)

    # torch oracle straight from plot_dino_correspondence.py:40-56
    t1, t2 = torch.from_numpy(feats), torch.from_numpy(feats2)
    tq = torch.from_numpy(qp)
    sfeats = F.grid_sample(t1, tq.permute(0, 2, 1, 3), padding_mode="border",
                           align_corners=True)
    def field_t(feats_t):
        attn = torch.einsum("nchw,ncij->nhwij", F.normalize(sfeats, dim=1),
                            F.normalize(feats_t, dim=1))
        attn = attn - attn.mean([3, 4], keepdim=True)
        attn = attn.clamp(0).squeeze(0)
        return F.interpolate(attn, (56, 56), mode="bilinear",
                             align_corners=True).squeeze(0)

    want_intra = field_t(t1).numpy()
    want_inter = field_t(t2).numpy()

    hi, he = correspondence_heatmaps(
        jnp.asarray(feats.transpose(0, 2, 3, 1)),
        jnp.asarray(feats2.transpose(0, 2, 3, 1)),
        jnp.asarray(qp), (56, 56),
    )
    np.testing.assert_allclose(np.asarray(hi), want_intra, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(he), want_inter, rtol=1e-4,
                               atol=1e-5)


def test_interpolated_query_path():
    pts = interpolated_query_path([[0, 0], [1, 1]], hold=3, steps=4)
    assert pts.shape == (1, 3 + 4 + 3, 1, 2)
    np.testing.assert_allclose(pts[0, 0, 0], [0, 0])
    np.testing.assert_allclose(pts[0, -1, 0], [1, 1])


def test_pr_curve_separates_good_from_random(rng):
    targets = rng.integers(0, 2, 5000)
    good = targets + 0.2 * rng.standard_normal(5000)
    rand = rng.standard_normal(5000)
    _, _, ap_good = pr_curve_data(good, targets.astype(np.float64))
    _, _, ap_rand = pr_curve_data(rand, targets.astype(np.float64))
    assert ap_good > 0.9 > ap_rand


def test_label_agreement_fd_shapes():
    feats = jr.normal(jr.PRNGKey(0), (2, 8, 8, 6))
    label = jr.randint(jr.PRNGKey(1), (2, 32, 32), -1, 3)
    coords1 = jr.uniform(jr.PRNGKey(2), (2, 4, 4, 2), minval=-1, maxval=1)
    coords2 = jr.uniform(jr.PRNGKey(3), (2, 4, 4, 2), minval=-1, maxval=1)
    ld, fd = label_agreement_fd(feats, label, 3, coords1, coords2)
    assert ld.shape == (2, 4, 4, 4, 4)
    assert fd.shape == (2, 4, 4, 4, 4)


def test_plot_pr_curves_writes(tmp_path, rng):
    targets = rng.integers(0, 2, 1000).astype(np.float64)
    curves = {"A": targets + 0.1 * rng.standard_normal(1000),
              "B": rng.standard_normal(1000)}
    aps = plot_pr_curves(str(tmp_path / "pr.png"), curves, targets)
    assert (tmp_path / "pr.png").exists()
    assert aps["A"] > aps["B"]


def test_rgb_to_lab_matches_known_values():
    # white -> L=100, a=b=0; black -> 0,0,0
    x = jnp.asarray([[[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]]])
    lab = np.asarray(rgb_to_normed_lab(x))[0, 0]
    np.testing.assert_allclose(lab[0] * [100, 256, 256], [100, 0, 0],
                               atol=0.2)
    np.testing.assert_allclose(lab[1] * [100, 256, 256], [0, 0, 0], atol=0.2)


def test_train_crf_codes_learns(tmp_path):
    cfg = Config(dim=4, continuous=True, crf_samples=64, color_space="rgb",
                 crop_type=None)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    out = train_crf_codes(cfg, imgs, epochs=40, log_every=10,
                          out_dir=str(tmp_path / "crf"))
    assert out["codes"].shape == (2, 16, 16, 4)
    assert np.isfinite(out["losses"]).all()
    assert out["losses"][-1] < out["losses"][0]  # optimizing reduces the loss
    assert any(p.name.startswith("codes_") for p in (tmp_path / "crf").iterdir())


def test_train_crf_codes_discrete(tmp_path):
    cfg = Config(dim=4, continuous=False, crf_samples=32, color_space="lab",
                 crop_type=None)
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, 12, 12, 3)).astype(np.float32)
    out = train_crf_codes(cfg, imgs, epochs=10, log_every=5)
    assert np.isfinite(out["losses"]).all()


def test_crf_recalibrator_improves_ap():
    """The learned CRF kernel (6 optax scalars, reference CRFModule
    plot_pr_curves.py:53-67) must reach at least the analytic kernel's AP on
    label agreement — here labels are spatially scrambled so the analytic
    kernel's strong spatial prior (w2 term) hurts and learning must adapt."""
    from stego_tpu.eval.analysis import (
        crf_kernel_fd,
        crf_module_apply,
        crf_pair_diffs,
        label_agreement_fd,
        pr_curve_data,
        train_crf_recalibrator,
    )

    key = jr.PRNGKey(0)
    b, hw, s = 6, 16, 6
    # fine-grained scrambled labels; colors correlate with labels, space
    # does not
    label = jr.randint(jr.fold_in(key, 1), (b, hw, hw), 0, 3)
    palette = jnp.asarray([[1.0, -1.0, 0.0], [-1.0, 1.0, 0.5],
                           [0.0, 0.2, -1.0]])
    img = palette[label] + 0.05 * jr.normal(jr.fold_in(key, 2),
                                            (b, hw, hw, 3))
    coords1 = jr.uniform(jr.fold_in(key, 3), (b, s, s, 2), minval=-1,
                         maxval=1)
    coords2 = jr.uniform(jr.fold_in(key, 4), (b, s, s, 2), minval=-1,
                         maxval=1)

    ld, _ = label_agreement_fd(img, label, 3, coords1, coords2)
    analytic = crf_kernel_fd(img, coords1, coords2)
    coord_diff, img_diff = crf_pair_diffs(img, coords1, coords2)
    params = train_crf_recalibrator(coord_diff, img_diff, ld, steps=250)
    learned = crf_module_apply(params, coord_diff, img_diff)

    _, _, ap_analytic = pr_curve_data(np.asarray(analytic), np.asarray(ld))
    _, _, ap_learned = pr_curve_data(np.asarray(learned), np.asarray(ld))
    assert np.isfinite(ap_learned)
    assert ap_learned >= ap_analytic - 1e-3, (ap_learned, ap_analytic)
    # the params must actually have moved
    from stego_tpu.eval.analysis import init_crf_module
    init = init_crf_module()
    assert any(abs(float(params[k]) - float(init[k])) > 1e-3 for k in init)
