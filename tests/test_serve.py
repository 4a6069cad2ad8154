"""Serving artifact (stego_tpu/serve.py): package -> load -> predict must
reproduce the in-process inference function exactly, via the serialized
StableHLO path with weights reloaded from the npz."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stego_tpu.config import Config
from stego_tpu.models.vit import ViTConfig, init_vit_params
from stego_tpu.serve import ServingModel, _serve_fn, package_from_parts
from stego_tpu.train.segmenter import UnsupervisedSegmenter

TINY = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4, img_size=16)


def _parts():
    cfg = Config(dataset_name="directory", dir_dataset_n_classes=3, res=16,
                 dim=6, crop_type=None, backbone_dtype="float32")
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=TINY)
    backbone = init_vit_params(jax.random.PRNGKey(0), TINY)
    params = seg.init_params(jax.random.PRNGKey(1))
    return seg, backbone, params


def test_package_load_predict_roundtrip(tmp_path):
    seg, backbone, params = _parts()
    out_dir = package_from_parts(seg, backbone, params, str(tmp_path / "art"),
                                 res=16, batch_size=2)

    model = ServingModel.load(out_dir)
    assert model.meta["res"] == 16 and model.meta["n_classes"] == 3

    img01 = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3)))
    out = model.predict(img01)
    assert out["linear_preds"].shape == (2, 16, 16)
    assert out["cluster_preds"].shape == (2, 16, 16)
    assert out["linear_probs"].shape == (2, 16, 16, 3)

    # exact agreement with the direct (non-exported) inference function
    serve_params = {k: params[k]
                    for k in ("head", "linear_probe", "cluster_probe")}
    ref = jax.jit(_serve_fn(seg))(backbone, serve_params, jnp.asarray(img01))
    np.testing.assert_allclose(out["linear_probs"],
                               np.asarray(ref["linear_probs"]), atol=1e-5)
    np.testing.assert_array_equal(out["cluster_preds"],
                                  np.asarray(ref["cluster_preds"]))


def test_weights_roundtrip_flatten():
    from stego_tpu.serve import _flatten, _unflatten

    tree = {"a": {"b": np.ones((2, 2)), "c": {"d": np.zeros(3)}},
            "e": np.arange(4)}
    flat = _flatten(tree)
    back = _unflatten(flat)
    assert set(flat) == {"a//b", "a//c//d", "e"}
    np.testing.assert_array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])
    np.testing.assert_array_equal(back["e"], tree["e"])


def test_spmd_package_matches_single_device(tmp_path):
    """n_devices=8 export: batch sharded over the data mesh, same outputs as
    the 1-device artifact (sharding is layout, not semantics)."""
    seg, backbone, params = _parts()
    d1 = package_from_parts(seg, backbone, params, str(tmp_path / "d1"),
                            res=16, batch_size=8, n_devices=1)
    d8 = package_from_parts(seg, backbone, params, str(tmp_path / "d8"),
                            res=16, batch_size=8, n_devices=8)

    img01 = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(5), (8, 16, 16, 3)))
    out1 = ServingModel.load(d1).predict(img01)
    m8 = ServingModel.load(d8)
    assert m8.meta["n_devices"] == 8
    out8 = m8.predict(img01)
    np.testing.assert_allclose(out8["linear_probs"], out1["linear_probs"],
                               atol=1e-5)
    np.testing.assert_array_equal(out8["cluster_preds"],
                                  out1["cluster_preds"])

    # SPMD artifacts are batch-polymorphic too (n_devices * b symbolic dim):
    # the SAME artifact serves a 16-image batch, and rejects a batch the mesh
    # cannot split evenly
    assert m8.meta["batch_polymorphic"] is True
    img16 = np.concatenate([img01, img01[::-1]], axis=0)
    out16 = m8.predict(img16)
    np.testing.assert_allclose(out16["linear_probs"][:8],
                               out1["linear_probs"], atol=1e-5)
    with pytest.raises(ValueError, match="divisible"):
        m8.predict(img01[:5])


def test_spmd_package_batch_divisibility():
    seg, backbone, params = _parts()
    with pytest.raises(ValueError, match="divide"):
        package_from_parts(seg, backbone, params, "/tmp/nope", res=16,
                           batch_size=6, n_devices=4)


def test_batch_polymorphic_artifact(tmp_path):
    """ONE single-device artifact serves any batch size: the export uses a
    symbolic batch dim (round-3 VERDICT item 7; was pinned to the packaging
    batch_size before)."""
    seg, backbone, params = _parts()
    out_dir = package_from_parts(seg, backbone, params, str(tmp_path / "poly"),
                                 res=16, batch_size=2)
    model = ServingModel.load(out_dir)
    assert model.meta["batch_polymorphic"] is True

    img5 = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(9), (5, 16, 16, 3)))
    out5 = model.predict(img5)
    assert out5["linear_preds"].shape == (5, 16, 16)
    out1 = model.predict(img5[2:3])
    # per-image results are batch-independent
    np.testing.assert_allclose(out1["linear_probs"][0],
                               out5["linear_probs"][2], atol=1e-5)
    np.testing.assert_array_equal(out1["cluster_preds"][0],
                                  out5["cluster_preds"][2])
