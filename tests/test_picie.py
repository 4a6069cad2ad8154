"""PiCIE baseline model tests."""

import jax.random as jr
import numpy as np
import torch

from stego_tpu.models.picie import (
    init_picie_decoder,
    load_picie_checkpoint,
    picie_features,
    picie_params_from_state_dict,
)
from stego_tpu.models.resnet import init_resnet50_params

from tests.test_fpn import make_torch_resnet50_sd


def test_picie_forward_shapes():
    backbone = init_resnet50_params(jr.PRNGKey(0))
    decoder = init_picie_decoder(jr.PRNGKey(1))
    img = jr.normal(jr.PRNGKey(2), (2, 64, 64, 3))
    out = picie_features(backbone, decoder, img)
    assert out.shape == (2, 16, 16, 256)  # stride 4, out_dim 256


def test_picie_state_dict_conversion():
    g = torch.Generator().manual_seed(0)
    sd = {"backbone." + k: v for k, v in make_torch_resnet50_sd().items()}
    for name, cin in [("layer1", 2048), ("layer2", 1024), ("layer3", 512),
                      ("layer4", 256)]:
        sd[f"decoder.{name}.weight"] = torch.randn(256, cin, 1, 1, generator=g)
        sd[f"decoder.{name}.bias"] = torch.randn(256, generator=g)
    params = picie_params_from_state_dict(sd)
    assert params["decoder"]["layer1"]["kernel"].shape == (2048, 256)
    img = jr.normal(jr.PRNGKey(2), (1, 64, 64, 3))
    out = picie_features(params["backbone"], params["decoder"], img)
    assert np.isfinite(np.asarray(out)).all()


def test_picie_pickled_module_loader(tmp_path):
    """The released file pickles whole torch modules; the permissive loader
    must extract tensors even when the original classes are unimportable."""
    import pickle
    import sys
    import types

    # fabricate a module class defined in a fake package, pickle it, delete
    # the package, then load
    fake = types.ModuleType("fake_picie_pkg")

    class FakeProbe(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.clusters = torch.nn.Parameter(torch.randn(5, 7))

    FakeProbe.__module__ = "fake_picie_pkg"
    FakeProbe.__qualname__ = "FakeProbe"
    fake.FakeProbe = FakeProbe
    sys.modules["fake_picie_pkg"] = fake

    sd = {"backbone." + k: v for k, v in make_torch_resnet50_sd().items()}
    g = torch.Generator().manual_seed(0)
    for name, cin in [("layer1", 2048), ("layer2", 1024), ("layer3", 512),
                      ("layer4", 256)]:
        sd[f"decoder.{name}.weight"] = torch.randn(256, cin, 1, 1, generator=g)
        sd[f"decoder.{name}.bias"] = torch.randn(256, generator=g)

    state = {"model": sd, "cluster_probe": FakeProbe()}
    path = str(tmp_path / "picie_and_probes.pth")
    torch.save(state, path)
    del sys.modules["fake_picie_pkg"]

    out = load_picie_checkpoint(path)
    assert out["cluster_probe"]["clusters"].shape == (5, 7)
    assert out["decoder"]["layer1"]["kernel"].shape == (2048, 256)
