"""Dense-CRF mean-field refinement in pure JAX (replaces pydensecrf).

Behavioral reference: src/crf.py — unary from bilinear-upsampled softmax
logits, a Gaussian pairwise term (sxy=1, compat=3) and a bilateral term
(sxy=67, srgb=3, compat=4) on the unnormalized image, 10 mean-field iterations.

TPU-native design instead of the reference's permutohedral-lattice C++:

* the Gaussian term (σ=1) is a small separable depthwise convolution — exact;
* the bilateral term (σ_xy=67, σ_rgb=3) is computed **exactly on a spatially
  downsampled grid** (factor ``BILATERAL_STRIDE``): with σ_xy=67 the kernel is
  nearly flat over a stride-8 cell, so average-pooling Q and guidance onto the
  coarse grid and doing the dense M×M kernel matmul there (MXU work: M≈1600 for
  320²) approximates the full-resolution filter closely; messages are
  bilinearly upsampled back;
* everything jits and batches — eval-time CRF runs on device instead of a host
  process pool (reference eval_segmentation.py:52-54).

This is an approximation of pydensecrf (which also approximates the dense
kernel, via the permutohedral lattice); SURVEY.md §7 gates it at ≤0.5 mIoU
delta on eval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.ops.interp import interpolate

# Parameter parity with reference src/crf.py:13-19
MAX_ITER = 10
POS_W = 3.0
POS_XY_STD = 1.0
BI_W = 4.0
BI_XY_STD = 67.0
BI_RGB_STD = 3.0

BILATERAL_STRIDE = 8


def _gaussian_kernel_1d(std: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * std**2))
    return k.astype(np.float32)


def _banded_gaussian_matrix(n: int, std: float) -> np.ndarray:
    """(n, n) banded Gaussian convolution matrix (zero boundary, SAME conv)."""
    radius = max(1, int(2 * std + 0.5))
    k = _gaussian_kernel_1d(std, radius)
    m = np.zeros((n, n), dtype=np.float32)
    rows = np.arange(n)
    for d in range(-radius, radius + 1):
        cols = rows + d
        ok = (cols >= 0) & (cols < n)
        m[rows[ok], cols[ok]] = k[d + radius]
    return m


def _spatial_filter_cm(q: jnp.ndarray, std: float) -> jnp.ndarray:
    """Separable Gaussian over channel-major (B, C, H, W) as two banded
    matmuls (the depthwise-conv formulation would put C back on the padded
    lane axis), self-interaction removed."""
    h, w = q.shape[-2:]
    mh = jnp.asarray(_banded_gaussian_matrix(h, std))
    mw = jnp.asarray(_banded_gaussian_matrix(w, std))
    out = jnp.einsum("ih,bchw->bciw", mh, q)
    out = jnp.einsum("jw,bciw->bcij", mw, out)
    return out - q  # remove self-interaction (k(0,0) = 1)


def _bilateral_kernel_coarse(image: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(B, M, M) dense bilateral kernel on the stride-pooled grid. Constant
    across mean-field iterations (it depends only on pixel positions and the
    guidance image), so callers hoist it out of the loop — building it was
    ~80% of the CRF's per-iteration cost."""
    b, h, w, _ = image.shape
    hc, wc = h // stride, w // stride
    img_c = jax.image.resize(image, (b, hc, wc, 3), "linear")

    ys = (jnp.arange(hc, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(wc, dtype=jnp.float32) + 0.5) * stride
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pos = jnp.stack([gy.ravel(), gx.ravel()], axis=-1)  # (M, 2)

    feat = img_c.reshape(b, hc * wc, 3)
    d_pos = jnp.sum(jnp.square(pos[:, None, :] - pos[None, :, :]), axis=-1)
    d_rgb = jnp.sum(
        jnp.square(feat[:, :, None, :] - feat[:, None, :, :]), axis=-1
    )
    kern = jnp.exp(
        -d_pos[None] / (2 * BI_XY_STD**2) - d_rgb / (2 * BI_RGB_STD**2)
    )
    # remove (coarse) self-interaction
    return kern * (1.0 - jnp.eye(hc * wc)[None])


def _bilateral_filter_coarse_cm(q: jnp.ndarray, kern: jnp.ndarray,
                                stride: int) -> jnp.ndarray:
    """Dense bilateral message on a stride-pooled grid, channel-major.

    q: (B, C, H, W) current beliefs; kern: (B, M, M) from
    :func:`_bilateral_kernel_coarse`. Returns (B, C, H, W) messages."""
    b, c, h, w = q.shape
    hc, wc = h // stride, w // stride
    q_c = jax.image.resize(q, (b, c, hc, wc), "linear") * (stride * stride)
    qf = q_c.reshape(b, c, hc * wc)
    msg = jnp.einsum("bmn,bcn->bcm", kern, qf,
                     preferred_element_type=jnp.float32)
    msg = msg.reshape(b, c, hc, wc)
    return jax.image.resize(msg, (b, c, h, w), "linear")


@functools.partial(jax.jit, static_argnames=("n_iter",))
def dense_crf(image01: jnp.ndarray, logits: jnp.ndarray,
              n_iter: int = MAX_ITER) -> jnp.ndarray:
    """Mean-field dense CRF.

    Args:
      image01: (B, H, W, 3) unnormalized RGB in [0, 1] (the reference converts
        to 0-255 BGR for pydensecrf; channel order is irrelevant to an
        isotropic RGB kernel, scale is matched by multiplying by 255).
      logits: (B, h, w, C) class logits at any resolution (bilinear-upsampled
        to the image size like reference crf.py:27-29).
    Returns:
      (B, H, W, C) refined class probabilities.
    """
    from stego_tpu.ops.interp import _linear_weight_matrix

    b, h, w, _ = image01.shape
    image = image01 * 255.0

    # Channel-major (B, C, H, W) throughout the loop: the class axis C (~27)
    # on the minor (lane) dimension pads to 128 and multiplied every
    # elementwise/filter/resize pass by ~4.7x HBM traffic (same trap as the
    # probe CE, ops/probe_ce.py). With W on lanes the padding is 320->384.
    lc = jnp.transpose(logits, (0, 3, 1, 2))
    # bilinear upsample to image res (torch semantics, matching interpolate())
    wh = jnp.asarray(_linear_weight_matrix(h, lc.shape[2], False).astype(np.float32))
    ww = jnp.asarray(_linear_weight_matrix(w, lc.shape[3], False).astype(np.float32))
    lc = jnp.einsum("ih,bchw->bciw", wh, lc)
    lc = jnp.einsum("jw,bciw->bcij", ww, lc)
    unary = jax.nn.log_softmax(lc, axis=1)

    q = jax.nn.softmax(unary, axis=1)
    kern = _bilateral_kernel_coarse(image, BILATERAL_STRIDE)

    def body(_, q):
        sp = _spatial_filter_cm(q, POS_XY_STD)
        bi = _bilateral_filter_coarse_cm(q, kern, BILATERAL_STRIDE)
        # Potts model: higher agreement with neighbors -> higher logit
        pairwise = POS_W * sp + BI_W * bi
        return jax.nn.softmax(unary + pairwise, axis=1)

    q = jax.lax.fori_loop(0, n_iter, body, q)
    return jnp.transpose(q, (0, 2, 3, 1))
