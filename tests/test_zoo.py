"""VGG-11 / DenseNet-121 embedder tests (torch functional oracles)."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import torch
import torch.nn.functional as F

from stego_tpu.models.zoo import (
    DENSENET121_BLOCKS,
    CutBackboneEmbedder,
    VGG11_CFG,
    densenet121_features,
    densenet121_params_from_torch,
    init_densenet121_params,
    init_vgg11_params,
    vgg11_features,
    vgg11_params_from_torch,
)


def make_vgg11_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    cin, idx = 3, 0
    for v in VGG11_CFG:
        if v == "M":
            idx += 2  # conv + relu then pool advances by... torchvision: conv,
            # relu (2 modules) per conv; pool adds 1
            idx -= 1
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.randn(v, cin, 3, 3,
                                                   generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn(v, generator=g) * 0.05
        cin = v
        idx += 2  # conv + ReLU
    return sd


def torch_vgg11_forward(sd, x):
    idxs = sorted(int(k.split(".")[1]) for k in sd if k.endswith(".weight"))
    it = iter(idxs)
    for v in VGG11_CFG:
        if v == "M":
            x = F.max_pool2d(x, 2, 2)
        else:
            i = next(it)
            x = F.relu(F.conv2d(x, sd[f"features.{i}.weight"],
                                sd[f"features.{i}.bias"], padding=1))
    return x.mean(dim=(2, 3))


def test_vgg11_matches_torch():
    sd = make_vgg11_sd()
    params = vgg11_params_from_torch(sd)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    want = torch_vgg11_forward(sd, x).numpy()
    got = np.asarray(vgg11_features(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vgg11_init_shapes():
    p = init_vgg11_params(jr.PRNGKey(0))
    out = vgg11_features(p, jr.normal(jr.PRNGKey(1), (1, 64, 64, 3)))
    assert out.shape == (1, 512)


def make_densenet_sd(seed=0):
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

    conv("features.conv0", 64, 3, 7)
    bn("features.norm0", 64)
    c = 64
    for bi, n in enumerate(DENSENET121_BLOCKS, start=1):
        for li in range(1, n + 1):
            pre = f"features.denseblock{bi}.denselayer{li}"
            bn(pre + ".norm1", c)
            conv(pre + ".conv1", 128, c, 1)
            bn(pre + ".norm2", 128)
            conv(pre + ".conv2", 32, 128, 3)
            c += 32
        if bi < 4:
            bn(f"features.transition{bi}.norm", c)
            conv(f"features.transition{bi}.conv", c // 2, c, 1)
            c = c // 2
    bn("features.norm5", c)
    return sd


def torch_densenet_forward(sd, x):
    def bnf(name, t):
        return F.batch_norm(t, sd[name + ".running_mean"],
                            sd[name + ".running_var"], sd[name + ".weight"],
                            sd[name + ".bias"], training=False)

    x = F.conv2d(x, sd["features.conv0.weight"], stride=2, padding=3)
    x = F.relu(bnf("features.norm0", x))
    x = F.max_pool2d(x, 3, 2, padding=1)
    for bi, n in enumerate(DENSENET121_BLOCKS, start=1):
        for li in range(1, n + 1):
            pre = f"features.denseblock{bi}.denselayer{li}"
            h = F.relu(bnf(pre + ".norm1", x))
            h = F.conv2d(h, sd[pre + ".conv1.weight"])
            h = F.relu(bnf(pre + ".norm2", h))
            h = F.conv2d(h, sd[pre + ".conv2.weight"], padding=1)
            x = torch.cat([x, h], 1)
        if bi < 4:
            pre = f"features.transition{bi}"
            x = F.conv2d(F.relu(bnf(pre + ".norm", x)),
                         sd[pre + ".conv.weight"])
            x = F.avg_pool2d(x, 2, 2)
    x = F.relu(bnf("features.norm5", x))
    return x.mean(dim=(2, 3))


def test_densenet121_matches_torch():
    sd = make_densenet_sd()
    params = densenet121_params_from_torch(sd)
    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    want = torch_densenet_forward(sd, x).numpy()
    got = np.asarray(densenet121_features(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1))))
    assert got.shape == (1, 1024)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_cut_backbone_embedder_api():
    for mt, dim in [("vgg11", 512), ("densenet121", 1024), ("resnet50", 2048)]:
        emb = CutBackboneEmbedder(mt)
        backbone = emb.load_or_init(None, jr.PRNGKey(0))
        out = emb.backbone_features(backbone,
                                    jr.normal(jr.PRNGKey(1), (1, 64, 64, 3)))
        assert out.shape == (1, 1, 1, dim), mt
