"""Behavioral tests for the JAX mean-field dense CRF."""

import jax.numpy as jnp
import numpy as np

from stego_tpu.ops.crf import dense_crf


def test_crf_valid_distribution():
    rng = np.random.default_rng(0)
    img = rng.random((1, 32, 32, 3), dtype=np.float32)
    logits = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    out = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(logits), n_iter=3))
    assert out.shape == (1, 32, 32, 4)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
    assert (out >= 0).all()


def test_crf_aligns_to_color_edges():
    """Noisy unaries on a two-color image: CRF should snap the label boundary
    to the color boundary and denoise."""
    rng = np.random.default_rng(1)
    h = w = 48
    img = np.zeros((1, h, w, 3), np.float32)
    img[:, :, : w // 2] = [0.9, 0.1, 0.1]
    img[:, :, w // 2:] = [0.1, 0.1, 0.9]

    true_label = np.zeros((h, w), np.int64)
    true_label[:, w // 2:] = 1

    # weak noisy logits: right class wins on average, 25% pixels flipped
    logits = np.zeros((1, h, w, 2), np.float32)
    logits[0, ..., 1] = (true_label * 2 - 1) * 1.0
    logits[0, ..., 0] = -logits[0, ..., 1]
    flip = rng.random((h, w)) < 0.25
    logits[0, flip] = -logits[0, flip]

    before_acc = ((logits[0].argmax(-1) == true_label).mean())
    out = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(logits)))
    after_acc = (out[0].argmax(-1) == true_label).mean()
    assert after_acc > before_acc
    assert after_acc > 0.95


def test_crf_channel_major_matches_nhwc_oracle():
    """The channel-major production loop must match a straightforward NHWC
    transliteration of the same mean-field math (the pre-optimization
    implementation)."""
    import jax

    from stego_tpu.ops.crf import (
        BI_W,
        BILATERAL_STRIDE,
        MAX_ITER,
        POS_W,
        POS_XY_STD,
        _bilateral_kernel_coarse,
        _gaussian_kernel_1d,
    )
    from stego_tpu.ops.interp import interpolate

    def oracle(image01, logits, n_iter=MAX_ITER):
        b, h, w, _ = image01.shape
        c = logits.shape[-1]
        logits = interpolate(logits, (h, w), "bilinear", align_corners=False)
        unary = jax.nn.log_softmax(logits, axis=-1)
        image = image01 * 255.0
        kern = _bilateral_kernel_coarse(image, BILATERAL_STRIDE)
        radius = max(1, int(2 * POS_XY_STD + 0.5))
        k = _gaussian_kernel_1d(POS_XY_STD, radius)
        kh = jnp.asarray(k).reshape(-1, 1, 1, 1)
        kw = jnp.asarray(k).reshape(1, -1, 1, 1)

        def conv(x, kk):
            return jax.lax.conv_general_dilated(
                x, jnp.tile(kk, (1, 1, 1, c)), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        q = jax.nn.softmax(unary, axis=-1)
        hc, wc = h // BILATERAL_STRIDE, w // BILATERAL_STRIDE
        for _ in range(n_iter):
            sp = conv(conv(q, kh), kw) - q
            q_c = jax.image.resize(q, (b, hc, wc, c), "linear") * (
                BILATERAL_STRIDE ** 2)
            msg = jnp.einsum("bmn,bnc->bmc", kern,
                             q_c.reshape(b, hc * wc, c))
            bi = jax.image.resize(msg.reshape(b, hc, wc, c), (b, h, w, c),
                                  "linear")
            q = jax.nn.softmax(unary + POS_W * sp + BI_W * bi, axis=-1)
        return q

    rng = np.random.default_rng(2)
    img = rng.random((2, 32, 32, 3), dtype=np.float32)
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    got = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(logits), n_iter=4))
    want = np.asarray(oracle(jnp.asarray(img), jnp.asarray(logits), n_iter=4))
    np.testing.assert_allclose(got, want, atol=2e-5)
