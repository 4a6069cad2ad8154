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
