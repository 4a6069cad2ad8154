"""ResNet-50 + FeaturePyramidNet tests (torch-oracle for the backbone,
shape/grad behavior for the FPN decoder and its train step)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
import torch

from stego_tpu.config import Config
from stego_tpu.models.fpn import FeaturePyramidNet
from stego_tpu.models.resnet import (
    init_resnet50_params,
    resnet50_features,
    resnet50_params_from_torch,
)
from stego_tpu.train.segmenter import UnsupervisedSegmenter, make_train_step


def make_torch_resnet50_sd(seed=0):
    """Random torchvision-style resnet50 state dict, built via torch's own
    resnet for key/shape fidelity — but torchvision isn't installed, so we
    synthesize keys from the architecture table."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = torch.randn(cout, cin, k, k, generator=g) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = 1 + 0.1 * torch.randn(c, generator=g)
        sd[name + ".bias"] = 0.1 * torch.randn(c, generator=g)
        sd[name + ".running_mean"] = 0.1 * torch.randn(c, generator=g)
        sd[name + ".running_var"] = (1 + 0.1 * torch.randn(c, generator=g)
                                     ).abs()

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, (planes, count) in enumerate(
        zip((64, 128, 256, 512), (3, 4, 6, 3)), start=1
    ):
        for b in range(count):
            pre = f"layer{stage}.{b}"
            conv(pre + ".conv1", planes, cin, 1)
            bn(pre + ".bn1", planes)
            conv(pre + ".conv2", planes, planes, 3)
            bn(pre + ".bn2", planes)
            conv(pre + ".conv3", planes * 4, planes, 1)
            bn(pre + ".bn3", planes * 4)
            if b == 0:
                conv(pre + ".downsample.0", planes * 4, cin, 1)
                bn(pre + ".downsample.1", planes * 4)
            cin = planes * 4
    return sd


def torch_resnet50_forward(sd, x):
    """Functional torch forward of the standard bottleneck ResNet-50."""
    import torch.nn.functional as F

    def bnf(name, t):
        return F.batch_norm(
            t, sd[name + ".running_mean"], sd[name + ".running_var"],
            sd[name + ".weight"], sd[name + ".bias"], training=False,
        )

    x = F.relu(bnf("bn1", F.conv2d(x, sd["conv1.weight"], stride=2,
                                   padding=3)))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    taps = {}
    cin = 64
    for stage, (planes, count) in enumerate(
        zip((64, 128, 256, 512), (3, 4, 6, 3)), start=1
    ):
        for b in range(count):
            pre = f"layer{stage}.{b}"
            stride = 2 if (stage > 1 and b == 0) else 1
            out = F.relu(bnf(pre + ".bn1",
                             F.conv2d(x, sd[pre + ".conv1.weight"])))
            out = F.relu(bnf(pre + ".bn2",
                             F.conv2d(out, sd[pre + ".conv2.weight"],
                                      stride=stride, padding=1)))
            out = bnf(pre + ".bn3", F.conv2d(out, sd[pre + ".conv3.weight"]))
            if b == 0:
                x = bnf(pre + ".downsample.1",
                        F.conv2d(x, sd[pre + ".downsample.0.weight"],
                                 stride=stride))
            x = F.relu(out + x)
        taps[f"layer{stage}"] = x
    return taps


def test_resnet50_matches_torch_oracle():
    sd = make_torch_resnet50_sd()
    params = resnet50_params_from_torch(sd)
    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    want = torch_resnet50_forward(sd, x)
    got = resnet50_features(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))
    for name in ("layer2", "layer3", "layer4"):
        np.testing.assert_allclose(
            np.asarray(got[name]).transpose(0, 3, 1, 2), want[name].numpy(),
            rtol=5e-3, atol=5e-4,
        )


@pytest.mark.parametrize("granularity", [1, 2, 3, 4])
def test_fpn_shapes(granularity):
    net = FeaturePyramidNet(granularity, dim=7, continuous=True)
    backbone = init_resnet50_params(jr.PRNGKey(0))
    head = net.init_head(jr.PRNGKey(1))
    img = jr.normal(jr.PRNGKey(2), (2, 224, 224, 3))
    feats, code = net.apply(backbone, head, img)
    assert feats.shape == (2, 7, 7, 2048)
    assert code.shape == (2, 56, 56, 7)


def test_fpn_discrete_log_softmax():
    net = FeaturePyramidNet(1, dim=5, continuous=False)
    backbone = init_resnet50_params(jr.PRNGKey(0))
    head = net.init_head(jr.PRNGKey(1))
    img = jr.normal(jr.PRNGKey(2), (1, 64, 64, 3))
    _, code = net.apply(backbone, head, img)
    np.testing.assert_allclose(np.exp(np.asarray(code)).sum(-1), 1.0,
                               atol=1e-5)


def test_fpn_train_step():
    cfg = Config(arch="feature-pyramid", model_type="resnet50", granularity=2,
                 dataset_name="directory", dir_dataset_name="s", res=64,
                 dim=6, feature_samples=4, neg_samples=2, crop_type=None,
                 backbone_dtype="float32", dino_patch_size=8)
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg)
    backbone = init_resnet50_params(jr.PRNGKey(0))
    state = seg.init_state(jr.PRNGKey(1))
    b = 4
    key = jr.PRNGKey(2)
    batch = {
        "img": jr.normal(key, (b, 64, 64, 3)),
        "img_pos": jr.normal(jr.fold_in(key, 1), (b, 64, 64, 3)),
        "label": jr.randint(jr.fold_in(key, 2), (b, 64, 64), -1, 3),
        "label_pos": jr.randint(jr.fold_in(key, 3), (b, 64, 64), -1, 3),
    }
    step = jax.jit(make_train_step(seg))
    state, metrics = step(backbone, state, batch, jr.PRNGKey(3))
    assert np.isfinite(float(metrics["loss/total"]))
    state, metrics2 = step(backbone, state, batch, jr.PRNGKey(4))
    assert np.isfinite(float(metrics2["loss/total"]))


def test_fpn_bn_running_stats():
    """BatchNorm parity (reference DoubleConv, modules.py:255-272): train mode
    uses batch stats; eval uses EMA running stats; the train step refreshes
    the EMA buffers (round-1 deviation: eval used batch stats)."""
    cfg = Config(arch="feature-pyramid", model_type="resnet50", granularity=2,
                 dataset_name="directory", dir_dataset_name="s", res=64,
                 dim=6, feature_samples=4, neg_samples=2, crop_type=None,
                 backbone_dtype="float32", dino_patch_size=8)
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg)
    backbone = init_resnet50_params(jr.PRNGKey(0))
    state = seg.init_state(jr.PRNGKey(1))
    ema0 = np.asarray(state["params"]["head"]["conv2"]["norm1"]["ema_mean"])
    assert (ema0 == 0).all()

    b = 4
    key = jr.PRNGKey(2)
    batch = {
        "img": jr.normal(key, (b, 64, 64, 3)),
        "img_pos": jr.normal(jr.fold_in(key, 1), (b, 64, 64, 3)),
        "label": jr.randint(jr.fold_in(key, 2), (b, 64, 64), -1, 3),
        "label_pos": jr.randint(jr.fold_in(key, 3), (b, 64, 64), -1, 3),
    }
    step = jax.jit(make_train_step(seg))
    state, _ = step(backbone, state, batch, jr.PRNGKey(3))
    norm = state["params"]["head"]["conv2"]["norm1"]
    ema1 = np.asarray(norm["ema_mean"])
    assert np.abs(ema1).max() > 0  # EMA moved

    # eval-mode code must use the running stats -> differ from train-mode
    # batch stats, and be batch-size independent
    net = seg.net
    taps = net.backbone_features(backbone, batch["img"])
    code_eval_full = net.head_code(state["params"]["head"], taps, train=False)
    taps1 = net.backbone_features(backbone, batch["img"][:1])
    code_eval_one = net.head_code(state["params"]["head"], taps1, train=False)
    np.testing.assert_allclose(np.asarray(code_eval_full[:1]),
                               np.asarray(code_eval_one), rtol=1e-4,
                               atol=1e-5)
    code_train = net.head_code(state["params"]["head"], taps, train=True)
    assert np.abs(np.asarray(code_eval_full) - np.asarray(code_train)).max() \
        > 1e-6
