"""Device-side augmentation (ops/augment.py) vs the host oracles in
data/transforms.py: the application math must match bit-for-bit up to float
associativity; sampling is checked for bounds/shape (different PRNGs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stego_tpu.data.transforms import (
    GeometricParams,
    PhotometricParams,
    apply_geometric,
    apply_photometric,
    make_coord_grid,
)
from stego_tpu.ops.augment import (
    GeomParams,
    PhotoParams,
    apply_geometric_device,
    apply_photometric_device,
    device_augment,
    sample_geometric,
    sample_photometric,
)


def _geom_batch(boxes, flips):
    return GeomParams(
        flip=jnp.asarray(flips),
        top=jnp.asarray([b[0] for b in boxes], jnp.float32),
        left=jnp.asarray([b[1] for b in boxes], jnp.float32),
        ch=jnp.asarray([b[2] for b in boxes], jnp.float32),
        cw=jnp.asarray([b[3] for b in boxes], jnp.float32),
    )


def test_geometric_matches_host_oracle():
    rng = np.random.default_rng(0)
    h = w = 24
    imgs = rng.random((3, h, w, 3)).astype(np.float32)
    boxes = [(2, 3, 19, 17), (0, 0, 24, 24), (5, 1, 12, 20)]
    flips = [True, False, True]

    dev_img, dev_coord = apply_geometric_device(
        jnp.asarray(imgs), _geom_batch(boxes, flips), out_res=h)

    for i in range(3):
        gp = GeometricParams(flip=flips[i], crop_box=boxes[i], out_res=h)
        host_img = apply_geometric(imgs[i], gp)
        host_coord = apply_geometric(make_coord_grid(h, w), gp)
        np.testing.assert_allclose(np.asarray(dev_img[i]), host_img,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dev_coord[i]), host_coord,
                                   rtol=0, atol=1e-5)


def test_photometric_matches_host_oracle():
    rng = np.random.default_rng(1)
    b, h, w = 4, 16, 16
    imgs = rng.random((b, h, w, 3)).astype(np.float32)
    orders = np.stack([rng.permutation(4) for _ in range(b)])
    bright = rng.uniform(0.7, 1.3, b)
    contr = rng.uniform(0.7, 1.3, b)
    sat = rng.uniform(0.7, 1.3, b)
    hue = rng.uniform(-0.1, 0.1, b)
    gray = np.array([True, False, False, True])

    pp_dev = PhotoParams(
        order=jnp.asarray(orders, jnp.int32),
        brightness=jnp.asarray(bright, jnp.float32),
        contrast=jnp.asarray(contr, jnp.float32),
        saturation=jnp.asarray(sat, jnp.float32),
        hue=jnp.asarray(hue, jnp.float32),
        grayscale=jnp.asarray(gray),
        blur=jnp.zeros(b, bool),
        blur_sigma=jnp.ones(b, jnp.float32),
    )
    out_dev = apply_photometric_device(jnp.asarray(imgs), pp_dev)

    for i in range(b):
        pp = PhotometricParams(
            order=orders[i], brightness=float(bright[i]),
            contrast=float(contr[i]), saturation=float(sat[i]),
            hue=float(hue[i]), grayscale=bool(gray[i]), blur_sigma=None,
        )
        host = apply_photometric(imgs[i], pp)
        np.testing.assert_allclose(np.asarray(out_dev[i]), host,
                                   rtol=0, atol=2e-5)


def test_blur_properties():
    # constant image is a fixed point of edge-extend blur; blur preserves the
    # mean (away from edges it's a convex combination) and shrinks variance
    rng = np.random.default_rng(2)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    img[1] = 0.5
    pp = PhotoParams(
        order=jnp.tile(jnp.arange(4, dtype=jnp.int32), (2, 1)),
        brightness=jnp.ones(2), contrast=jnp.ones(2),
        saturation=jnp.ones(2), hue=jnp.zeros(2),
        grayscale=jnp.zeros(2, bool),
        blur=jnp.ones(2, bool), blur_sigma=jnp.asarray([1.5, 1.5]),
    )
    out = np.asarray(apply_photometric_device(jnp.asarray(img), pp))
    np.testing.assert_allclose(out[1], 0.5, atol=1e-6)
    assert out[0].std() < img[0].std() * 0.8
    assert abs(out[0].mean() - img[0].mean()) < 0.02


def test_sampling_bounds():
    b, h, w = 8, 28, 28
    gp = sample_geometric(jax.random.PRNGKey(0), b, h, w)
    assert gp.top.shape == (b,)
    top, left = np.asarray(gp.top), np.asarray(gp.left)
    ch, cw = np.asarray(gp.ch), np.asarray(gp.cw)
    assert (ch >= 1).all() and (ch <= h).all()
    assert (cw >= 1).all() and (cw <= w).all()
    assert (top >= 0).all() and (top + ch <= h).all()
    assert (left >= 0).all() and (left + cw <= w).all()
    areas = ch * cw / (h * w)
    assert (areas > 0.5).all()  # scale in (0.8, 1.0) with rounding slack

    pp = sample_photometric(jax.random.PRNGKey(1), b)
    o = np.sort(np.asarray(pp.order), axis=1)
    np.testing.assert_array_equal(o, np.tile(np.arange(4), (b, 1)))
    assert (np.asarray(pp.brightness) >= 0.7).all()
    assert (np.asarray(pp.blur_sigma) <= 2.0).all()


def test_device_augment_end_to_end():
    key = jax.random.PRNGKey(3)
    img = jax.random.normal(key, (4, 32, 32, 3))
    img_aug, coord_aug = jax.jit(device_augment)(jax.random.PRNGKey(4), img)
    assert img_aug.shape == img.shape
    assert coord_aug.shape == (4, 32, 32, 2)
    assert np.isfinite(np.asarray(img_aug)).all()
    c = np.asarray(coord_aug)
    assert (c >= -1.0 - 1e-5).all() and (c <= 1.0 + 1e-5).all()
    # y-coords increase down rows, and each row of y is constant
    assert (np.diff(c[..., 0], axis=1) >= -1e-6).all()
    np.testing.assert_allclose(
        c[..., 0], np.broadcast_to(c[..., 0][:, :, :1], c[..., 0].shape),
        atol=1e-6)


def test_train_step_with_device_augs():
    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig, init_vit_params
    from stego_tpu.train.segmenter import UnsupervisedSegmenter, make_train_step

    tiny = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16)
    cfg = Config(dataset_name="directory", dir_dataset_n_classes=3, res=16,
                 dim=6, feature_samples=3, neg_samples=1, crop_type=None,
                 backbone_dtype="float32", batch_size=2,
                 aug_alignment_weight=0.1, device_augs=True)
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny)
    backbone = init_vit_params(jax.random.PRNGKey(0), tiny)
    state = seg.init_state(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    batch = {
        "img": jax.random.normal(key, (2, 16, 16, 3)),
        "img_pos": jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 16, 3)),
        "label": jax.random.randint(jax.random.fold_in(key, 2), (2, 16, 16),
                                    -1, 3),
        "label_pos": jax.random.randint(jax.random.fold_in(key, 3), (2, 16, 16),
                                        -1, 3),
    }
    step = jax.jit(make_train_step(seg))
    new_state, metrics = step(backbone, state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss/aug_alignment"]))
    assert float(metrics["loss/aug_alignment"]) < 0  # cosine agreement
    assert int(new_state["step"]) == 1


def test_host_photometric_4channel():
    """4-channel host jitter: RGB ops on the RGB slice, IR untouched by color
    ops (blur off) — mirrors the device path."""
    rng = np.random.default_rng(5)
    img4 = rng.random((12, 12, 4)).astype(np.float32)
    pp = PhotometricParams(
        order=np.arange(4), brightness=1.2, contrast=0.9, saturation=1.1,
        hue=0.05, grayscale=True, blur_sigma=None,
    )
    out4 = apply_photometric(img4, pp)
    out3 = apply_photometric(img4[..., :3], pp)
    assert out4.shape == (12, 12, 4)
    np.testing.assert_allclose(out4[..., :3], out3, atol=1e-6)
    np.testing.assert_allclose(out4[..., 3], img4[..., 3], atol=0)

    # blur covers all 4 channels without crashing
    pp_blur = PhotometricParams(
        order=np.arange(4), brightness=None, contrast=None, saturation=None,
        hue=None, grayscale=False, blur_sigma=1.5,
    )
    out_blur = apply_photometric(img4, pp_blur)
    assert out_blur.shape == (12, 12, 4)
    assert out_blur[..., 3].std() < img4[..., 3].std()
