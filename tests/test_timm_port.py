"""Weight-porter tests.

timm itself is not in this image, so:
* ResNet: a minimal torch ResNet-18 with timm-compatible parameter names is
  built in-test; outputs of the ported Flax model must match torch ≤1e-4.
* ViT: one timm-style torch encoder block (pre-LN, fused qkv) checks the
  trickiest mapping (qkv → per-head flax kernels) numerically.
* MobileNetV3: the ported tree must be structurally identical (same leaves,
  same shapes) to a fresh ``model.init`` tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neighbour_feature_pooling_tpu.models.backbones import (
    MobileNetV3Large,
    resnet18,
)
from neighbour_feature_pooling_tpu.models.backbones.timm_port import (
    adapt_in_chans,
    port_mobilenetv3,
    port_resnet,
    port_vit,
)

torch = pytest.importorskip("torch")
torch_nn = torch.nn


def _torch_resnet18_features():
    """Minimal torch ResNet-18 feature extractor with timm parameter names."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = 64
            for si, (cout, stride) in enumerate(
                    ((64, 1), (128, 2), (256, 2), (512, 2))):
                setattr(self, f"layer{si + 1}", nn.Sequential(
                    BasicBlock(cin, cout, stride), BasicBlock(cout, cout)))
                cin = cout

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for i in range(1, 5):
                x = getattr(self, f"layer{i}")(x)
            return x

    return Net()


def test_resnet18_port_numerical():
    net = _torch_resnet18_features().eval()
    # randomize BN stats so the port is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch_nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables = port_resnet(sd, layers=(2, 2, 2, 2), bottleneck=False)

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        golden = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    model = resnet18()
    ours = model.apply(variables, jnp.asarray(x), train=False)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)


def test_vit_block_port_numerical():
    """timm-style fused-qkv block vs flax EncoderBlock with ported weights."""
    import torch.nn as nn

    d, heads, n = 192, 3, 10

    class TimmBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(d, eps=1e-6)
            self.qkv = nn.Linear(d, 3 * d)
            self.proj = nn.Linear(d, d)
            self.norm2 = nn.LayerNorm(d, eps=1e-6)
            self.fc1 = nn.Linear(d, 4 * d)
            self.fc2 = nn.Linear(4 * d, d)

        def forward(self, x):
            b, t, _ = x.shape
            hd = d // heads
            y = self.norm1(x)
            qkv = self.qkv(y).reshape(b, t, 3, heads, hd).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * hd ** -0.5
            att = att.softmax(dim=-1)
            y = (att @ v).transpose(1, 2).reshape(b, t, d)
            x = x + self.proj(y)
            y = self.norm2(x)
            y = self.fc2(torch.nn.functional.gelu(self.fc1(y)))
            return x + y

    blk = TimmBlock().eval()
    sd = {}
    sd["blocks.0.attn.qkv.weight"] = blk.qkv.weight.detach().numpy()
    sd["blocks.0.attn.qkv.bias"] = blk.qkv.bias.detach().numpy()
    sd["blocks.0.attn.proj.weight"] = blk.proj.weight.detach().numpy()
    sd["blocks.0.attn.proj.bias"] = blk.proj.bias.detach().numpy()
    for ln in ("norm1", "norm2"):
        sd[f"blocks.0.{ln}.weight"] = getattr(blk, ln).weight.detach().numpy()
        sd[f"blocks.0.{ln}.bias"] = getattr(blk, ln).bias.detach().numpy()
    sd["blocks.0.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
    sd["blocks.0.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
    sd["blocks.0.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
    sd["blocks.0.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
    # dummy extras so port_vit(depth=1) has everything it touches
    sd["cls_token"] = np.zeros((1, 1, d), np.float32)
    sd["pos_embed"] = np.zeros((1, 197, d), np.float32)
    sd["patch_embed.proj.weight"] = np.zeros((d, 3, 16, 16), np.float32)
    sd["patch_embed.proj.bias"] = np.zeros((d,), np.float32)
    sd["norm.weight"] = np.ones((d,), np.float32)
    sd["norm.bias"] = np.zeros((d,), np.float32)

    variables = port_vit(sd, depth=1, num_heads=heads)

    from neighbour_feature_pooling_tpu.models.backbones.vit import EncoderBlock

    x = np.random.default_rng(1).standard_normal((2, n, d)).astype(np.float32)
    with torch.no_grad():
        golden = blk(torch.from_numpy(x)).numpy()
    flax_blk = EncoderBlock(num_heads=heads, mlp_ratio=4.0)
    ours = flax_blk.apply(
        {"params": variables["params"]["block_0"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-4, rtol=1e-4)


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_mobilenetv3_port_structure():
    """The ported tree must exactly match the flax init tree (names+shapes).

    A synthetic timm-named state dict is generated from the architecture
    table, so this catches porter/naming/shape drift without timm."""
    from neighbour_feature_pooling_tpu.models.backbones.mobilenetv3 import (
        _STAGES, _make_divisible)

    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = np.zeros((o, i, k, k), np.float32)

    def bn(name, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{s}"] = np.zeros((c,), np.float32)

    conv("conv_stem", 16, 3, 3)
    bn("bn1", 16)
    cin = 16
    for si, stage in enumerate(_STAGES):
        for bi, cfg in enumerate(stage):
            t = f"blocks.{si}.{bi}"
            if si == 0:
                conv(t + ".conv_dw", cfg.exp_ch, 1, cfg.kernel)
                sd[t + ".conv_dw.weight"] = np.zeros(
                    (cfg.exp_ch, 1, cfg.kernel, cfg.kernel), np.float32)
                bn(t + ".bn1", cfg.exp_ch)
                conv(t + ".conv_pw", cfg.out_ch, cfg.exp_ch, 1)
                bn(t + ".bn2", cfg.out_ch)
            else:
                conv(t + ".conv_pw", cfg.exp_ch, cin, 1)
                bn(t + ".bn1", cfg.exp_ch)
                sd[t + ".conv_dw.weight"] = np.zeros(
                    (cfg.exp_ch, 1, cfg.kernel, cfg.kernel), np.float32)
                bn(t + ".bn2", cfg.exp_ch)
                conv(t + ".conv_pwl", cfg.out_ch, cfg.exp_ch, 1)
                bn(t + ".bn3", cfg.out_ch)
            if cfg.use_se:
                rd = _make_divisible(cfg.exp_ch / 4)
                conv(t + ".se.conv_reduce", rd, cfg.exp_ch, 1)
                sd[t + ".se.conv_reduce.bias"] = np.zeros((rd,), np.float32)
                conv(t + ".se.conv_expand", cfg.exp_ch, rd, 1)
                sd[t + ".se.conv_expand.bias"] = np.zeros((cfg.exp_ch,),
                                                          np.float32)
            cin = cfg.out_ch
    conv("blocks.6.0.conv", 960, 160, 1)
    bn("blocks.6.0.bn1", 960)
    conv("conv_head", 1280, 960, 1)
    sd["conv_head.bias"] = np.zeros((1280,), np.float32)

    ported = port_mobilenetv3(sd)

    model = MobileNetV3Large()
    x = jnp.zeros((1, 64, 64, 3))
    ref = model.init(jax.random.PRNGKey(0), x, mode="head")
    want_p = _tree_shapes(ref["params"])
    got_p = _tree_shapes(ported["params"])
    assert want_p == got_p
    want_s = _tree_shapes(ref["batch_stats"])
    got_s = _tree_shapes(ported["batch_stats"])
    assert want_s == got_s


def test_adapt_in_chans():
    k = np.random.default_rng(0).standard_normal((3, 3, 3, 8)).astype(
        np.float32)
    k13 = adapt_in_chans(k, 13)
    assert k13.shape == (3, 3, 13, 8)
    # exact magnitude preservation for channel multiples (6 = 2x3)...
    k6 = adapt_in_chans(k, 6)
    resp6 = np.einsum("hwc,hwco->o", np.ones((3, 3, 6)), k6)
    resp3 = np.einsum("hwc,hwco->o", np.ones((3, 3, 3)), k)
    np.testing.assert_allclose(resp6, resp3, rtol=1e-5)
    # ...and approximate for non-multiples (timm's own repeat+rescale is too)
    resp13 = np.einsum("hwc,hwco->o", np.ones((3, 3, 13)), k13)
    assert np.abs(resp13 - resp3).max() < 0.5 * np.abs(resp3).max() + 1e-3
