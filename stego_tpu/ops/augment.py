"""Device-side paired augmentation for the aug-alignment loss.

The reference computes its augmented view on the host: torchvision
RandomHorizontalFlip + RandomResizedCrop on image AND coordinate grid, then
ColorJitter(.3,.3,.3,.1) / RandomGrayscale(.2) / GaussianBlur on the image
(reference src/train_segmentation.py:408-416, src/data.py:557-563). On this
repo's single-core host that costs ~160 ms/image — the loader tops out at
~6 imgs/s with photometric augs on, two orders of magnitude under what the
chip consumes.

This module is the TPU-native redesign: the whole augmentation runs INSIDE the
jitted train step from per-batch PRNG keys. Design notes:

* Geometric resampling is separable, so instead of a gather-based
  ``grid_sample`` we build per-sample bilinear interpolation matrices with
  dynamic (traced) crop boxes and run two batched matmuls on the MXU
  (``einsum('bih,bhwc->biwc')`` then ``('bjw,biwc->bijc')``) — the same trick
  as ops/interp.py but with data-dependent weights.
* The coordinate grid never needs resampling at all: bilinear interpolation of
  a linear ramp is the ramp evaluated at the (edge-clamped) source coordinate,
  so ``coord_aug`` is produced in closed form from the crop box.
* Gaussian blur with a per-sample traced sigma is also expressed as two
  banded-matrix matmuls (edge-extend boundary); the band constants are
  precomputed one-hot shift matrices, so only the 13 per-sample kernel taps
  are data-dependent.
* Photometric ops run on unnormalized [0,1] RGB (same deviation from the
  reference as the host path — see data/transforms.py module docstring) in a
  per-sample random order via masked selects.

Application math matches the host implementations in data/transforms.py
bit-for-bit up to float associativity (tested in tests/test_augment.py);
parameter *sampling* uses jax PRNG instead of numpy Generators, so draws are
distribution-equivalent, not bitwise.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

BLUR_HALF = 6  # 13-tap kernel covers 3*sigma for the sampled sigma<=2.0


class GeomParams(NamedTuple):
    flip: jnp.ndarray   # (B,) bool
    top: jnp.ndarray    # (B,) f32 (integer-valued)
    left: jnp.ndarray   # (B,) f32
    ch: jnp.ndarray     # (B,) f32 crop height
    cw: jnp.ndarray     # (B,) f32 crop width


class PhotoParams(NamedTuple):
    order: jnp.ndarray       # (B, 4) int32 permutation of ops
    brightness: jnp.ndarray  # (B,) f32
    contrast: jnp.ndarray    # (B,) f32
    saturation: jnp.ndarray  # (B,) f32
    hue: jnp.ndarray         # (B,) f32 in turns
    grayscale: jnp.ndarray   # (B,) bool
    blur: jnp.ndarray        # (B,) bool
    blur_sigma: jnp.ndarray  # (B,) f32


# ----------------------------------------------------------------------
# parameter sampling (distribution parity with data/transforms.py samplers)


def sample_geometric(key: jax.Array, b: int, h: int, w: int,
                     scale: Tuple[float, float] = (0.8, 1.0),
                     ratio: Tuple[float, float] = (3 / 4, 4 / 3)) -> GeomParams:
    """RandomHorizontalFlip(0.5) + RandomResizedCrop parameter draw
    (torchvision semantics: 10 candidate (scale, aspect) draws, first fit
    wins, else the largest ratio-clamped center crop)."""
    kf, ks, ka, kt, kl = jax.random.split(key, 5)
    flip = jax.random.bernoulli(kf, 0.5, (b,))
    area = float(h * w)
    target = area * jax.random.uniform(ks, (b, 10), minval=scale[0],
                                       maxval=scale[1])
    import math

    log_r = jax.random.uniform(ka, (b, 10), minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.round(jnp.sqrt(target * aspect))
    ch = jnp.round(jnp.sqrt(target / aspect))
    valid = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    first = jnp.argmax(valid, axis=1)
    any_valid = jnp.any(valid, axis=1)
    pick = lambda a: jnp.take_along_axis(a, first[:, None], axis=1)[:, 0]
    cw_c, ch_c = pick(cw), pick(ch)
    u_top = pick(jax.random.uniform(kt, (b, 10)))
    u_left = pick(jax.random.uniform(kl, (b, 10)))
    top_c = jnp.floor(u_top * (h - ch_c + 1))
    left_c = jnp.floor(u_left * (w - cw_c + 1))

    # fallback: largest center crop within the ratio bounds
    in_ratio = w / h
    if in_ratio < ratio[0]:
        fw, fh = float(w), float(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        fh, fw = float(h), float(round(h * ratio[1]))
    else:
        fw, fh = float(w), float(h)
    f_top, f_left = (h - fh) // 2, (w - fw) // 2

    sel = lambda c, f: jnp.where(any_valid, c, f).astype(jnp.float32)
    return GeomParams(flip=flip, top=sel(top_c, f_top), left=sel(left_c, f_left),
                      ch=sel(ch_c, fh), cw=sel(cw_c, fw))


def sample_photometric(key: jax.Array, b: int,
                       brightness: float = 0.3, contrast: float = 0.3,
                       saturation: float = 0.3, hue: float = 0.1,
                       p_gray: float = 0.2, p_blur: float = 0.5) -> PhotoParams:
    """ColorJitter(.3,.3,.3,.1) + RandomGrayscale(.2) + RandomApply(blur)
    parameters (reference train_segmentation.py:412-416)."""
    ko, kb, kc, ks, kh, kg, kp, kq = jax.random.split(key, 8)
    order = jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(ko, b))
    return PhotoParams(
        order=order.astype(jnp.int32),
        brightness=jax.random.uniform(kb, (b,), minval=1 - brightness,
                                      maxval=1 + brightness),
        contrast=jax.random.uniform(kc, (b,), minval=1 - contrast,
                                    maxval=1 + contrast),
        saturation=jax.random.uniform(ks, (b,), minval=1 - saturation,
                                      maxval=1 + saturation),
        hue=jax.random.uniform(kh, (b,), minval=-hue, maxval=hue),
        grayscale=jax.random.bernoulli(kg, p_gray, (b,)),
        blur=jax.random.bernoulli(kp, p_blur, (b,)),
        blur_sigma=jax.random.uniform(kq, (b,), minval=0.1, maxval=2.0),
    )


# ----------------------------------------------------------------------
# geometric application


def _crop_coords(start: jnp.ndarray, clen: jnp.ndarray, out: int):
    """Fractional source coordinates of the flip+crop+resize chain, matching
    host transforms exactly: integer-pixel crop then bilinear resize with
    torch align_corners=False semantics (transforms.resize_bilinear_np /
    ops/interp._linear_weight_matrix). Returns absolute coords (B, out)."""
    i = jnp.arange(out, dtype=jnp.float32) + 0.5
    src = i[None, :] * (clen[:, None] / out) - 0.5
    src = jnp.maximum(src, 0.0)          # torch clamps src >= 0
    src = jnp.minimum(src, clen[:, None] - 1.0)  # edge clamp inside the crop
    return start[:, None] + src


def _interp_matrix(coords: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, out, n) bilinear interpolation matrix for absolute coords."""
    x0 = jnp.clip(jnp.floor(coords), 0, n - 1)
    x1 = jnp.minimum(x0 + 1, n - 1)
    t = jnp.clip(coords - x0, 0.0, 1.0)
    oh0 = jax.nn.one_hot(x0.astype(jnp.int32), n, dtype=jnp.float32)
    oh1 = jax.nn.one_hot(x1.astype(jnp.int32), n, dtype=jnp.float32)
    return oh0 * (1.0 - t)[..., None] + oh1 * t[..., None]


def apply_geometric_device(img: jnp.ndarray, p: GeomParams, out_res: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip + crop-resize of a (B, H, W, C) image, plus the matching
    coordinate grid (B, out, out, 2) in closed form (channels (y, x) in
    [-1, 1], reference data.py:530-532 grid convention)."""
    b, h, w = img.shape[:3]
    ys = _crop_coords(p.top, p.ch, out_res)          # (B, out) absolute rows
    xs = _crop_coords(p.left, p.cw, out_res)         # (B, out) crop-frame cols
    # host order is flip-then-crop: the crop indexes the flipped array, so the
    # image gathers at mirrored columns
    x_img = jnp.where(p.flip[:, None], (w - 1.0) - xs, xs)

    wy = _interp_matrix(ys, h)
    wx = _interp_matrix(x_img, w)
    out = jnp.einsum("bih,bhwc->biwc", wy, img.astype(jnp.float32))
    out = jnp.einsum("bjw,biwc->bijc", wx, out)

    # coordinate grid: linear ramps evaluated at the source coordinates (the
    # x-ramp of a flipped grid is mirrored)
    cy = -1.0 + 2.0 * ys / (h - 1.0)
    cx_plain = -1.0 + 2.0 * xs / (w - 1.0)
    cx = jnp.where(p.flip[:, None], 1.0 - 2.0 * xs / (w - 1.0), cx_plain)
    coord = jnp.stack([
        jnp.broadcast_to(cy[:, :, None], (b, out_res, out_res)),
        jnp.broadcast_to(cx[:, None, :], (b, out_res, out_res)),
    ], axis=-1)
    return out, coord


# ----------------------------------------------------------------------
# photometric application (jnp ports of data/transforms.py, oracle-tested)


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    g = (0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    return jnp.repeat(g[..., None], 3, axis=-1)


def _adjust_hue(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """Hue shift by ``factor`` turns via an HSV round-trip; jnp port of
    transforms._adjust_hue (factor broadcasts per sample)."""
    maxc = img.max(-1)
    minc = img.min(-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    rc = jnp.where(delta > 0, (maxc - img[..., 0]) / jnp.maximum(delta, 1e-12), 0)
    gc = jnp.where(delta > 0, (maxc - img[..., 1]) / jnp.maximum(delta, 1e-12), 0)
    bc = jnp.where(delta > 0, (maxc - img[..., 2]) / jnp.maximum(delta, 1e-12), 0)
    hch = jnp.where(
        img[..., 0] == maxc, bc - gc,
        jnp.where(img[..., 1] == maxc, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    hch = (hch / 6.0) % 1.0
    hch = (hch + factor) % 1.0
    i = jnp.floor(hch * 6.0)
    f = hch * 6.0 - i
    pp = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    choices = jnp.stack([
        jnp.stack([v, t, pp], -1), jnp.stack([q, v, pp], -1),
        jnp.stack([pp, v, t], -1), jnp.stack([pp, q, v], -1),
        jnp.stack([t, pp, v], -1), jnp.stack([v, pp, q], -1),
    ], 0)
    return jnp.take_along_axis(
        choices, jnp.broadcast_to(i[None, ..., None], (1,) + i.shape + (3,)),
        axis=0,
    )[0]


@functools.lru_cache(maxsize=8)
def _shift_bands_np(n: int):
    """(2*BLUR_HALF+1, n, n) one-hot shift matrices with edge-extend clamping
    (out-of-range taps accumulate on the edge pixel). Cached as NUMPY — a
    cached jnp array created under one jit trace would leak that trace's
    tracer into later traces."""
    import numpy as np

    bands = np.zeros((2 * BLUR_HALF + 1, n, n), dtype=np.float32)
    rows = np.arange(n)
    for d in range(-BLUR_HALF, BLUR_HALF + 1):
        cols = np.clip(rows + d, 0, n - 1)
        np.add.at(bands[d + BLUR_HALF], (rows, cols), 1.0)
    return bands


def _shift_bands(n: int):
    return jnp.asarray(_shift_bands_np(n))


def _gaussian_blur(img: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Separable 13-tap Gaussian blur with per-sample traced sigma, expressed
    as two banded-matrix matmuls (edge-extend boundary)."""
    b, h, w = img.shape[:3]
    d = jnp.arange(-BLUR_HALF, BLUR_HALF + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (d[None, :] / jnp.maximum(sigma[:, None], 1e-6)) ** 2)
    k = k / jnp.sum(k, axis=1, keepdims=True)              # (B, 13)
    wy = jnp.einsum("bk,kij->bij", k, _shift_bands(h))     # (B, h, h)
    wx = jnp.einsum("bk,kij->bij", k, _shift_bands(w))     # (B, w, w)
    out = jnp.einsum("bih,bhwc->biwc", wy, img)
    return jnp.einsum("bjw,biwc->bijc", wx, out)


def apply_photometric_device(img: jnp.ndarray, p: PhotoParams) -> jnp.ndarray:
    """ColorJitter in per-sample random order + grayscale + blur on a
    (B, H, W, C) [0,1] image. jnp port of transforms.apply_photometric (the
    blur kernel is a truncated Gaussian rather than PIL's box-chain
    approximation — a distributional knob, like the [0,1]-space jitter).
    4-channel inputs (Potsdam IR): color ops apply to the RGB slice, blur to
    all channels."""
    bb = lambda a: a[:, None, None, None]
    extra = None
    if img.shape[-1] > 3:
        img, extra = img[..., :3], img[..., 3:]

    def _bright(x):
        return jnp.clip(x * bb(p.brightness), 0, 1)

    def _contrast(x):
        mean = jnp.mean(_grayscale(x), axis=(1, 2, 3), keepdims=True)
        return jnp.clip(mean + bb(p.contrast) * (x - mean), 0, 1)

    def _sat(x):
        g = _grayscale(x)
        return jnp.clip(g + bb(p.saturation) * (x - g), 0, 1)

    def _hue(x):
        return jnp.clip(_adjust_hue(x, p.hue[:, None, None]), 0, 1)

    ops = (_bright, _contrast, _sat, _hue)
    for slot in range(4):
        op_id = p.order[:, slot]                      # (B,)
        cands = jnp.stack([f(img) for f in ops], 0)   # (4, B, H, W, C)
        img = jnp.take_along_axis(
            cands, jnp.broadcast_to(op_id[None, :, None, None, None],
                                    (1,) + img.shape), axis=0)[0]
    img = jnp.where(bb(p.grayscale), _grayscale(img), img)
    if extra is not None:
        img = jnp.concatenate([img, extra], axis=-1)
    img = jnp.where(bb(p.blur), _gaussian_blur(img, p.blur_sigma), img)
    return img


# ----------------------------------------------------------------------
# top-level entry used by the train step


def device_augment(key: jax.Array, img_normalized: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(img_aug, coord_aug) from an ImageNet-normalized (B, H, W, 3) batch —
    the device-resident equivalent of ContrastiveSegDataset's host aug branch
    (data/contrastive.py:173-189). Fully jittable; runs inside the train step."""
    from stego_tpu.data.transforms import channel_stats

    b, h, w = img_normalized.shape[:3]
    kg, kp = jax.random.split(key)
    gp = sample_geometric(kg, b, h, w)
    pp = sample_photometric(kp, b)

    mean, std = (jnp.asarray(s)
                 for s in channel_stats(img_normalized.shape[-1]))
    img01 = jnp.clip(img_normalized.astype(jnp.float32) * std + mean, 0, 1)
    img_aug, coord_aug = apply_geometric_device(img01, gp, out_res=h)
    img_aug = apply_photometric_device(jnp.clip(img_aug, 0, 1), pp)
    return (img_aug - mean) / std, coord_aug
