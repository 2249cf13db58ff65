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


# --------------------------------------------------------------------------
# Full-forward porter parity (VERDICT round-1 item 3): MobileNetV3 and ViT
# get the same end-to-end numerical treatment the ResNet port already had.
# Torch nets below use timm's module/parameter names and timm semantics
# (BN eps 1e-5, hardswish/hardsigmoid, SE on expanded channels).
# --------------------------------------------------------------------------


def _torch_mobilenetv3_features(in_chans=3):
    import torch.nn as nn
    import torch.nn.functional as F

    from neighbour_feature_pooling_tpu.models.backbones.mobilenetv3 import (
        _STAGES, _make_divisible)

    class SE(nn.Module):
        def __init__(self, ch, rd):
            super().__init__()
            self.conv_reduce = nn.Conv2d(ch, rd, 1)
            self.conv_expand = nn.Conv2d(rd, ch, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = torch.relu(self.conv_reduce(s))
            s = self.conv_expand(s)
            return x * F.hardsigmoid(s)

    def act_fn(name):
        return torch.relu if name == "re" else F.hardswish

    class DepthwiseSeparable(nn.Module):  # timm stage-0 block
        def __init__(self, cfg, cin):
            super().__init__()
            k = cfg.kernel
            self.conv_dw = nn.Conv2d(cin, cin, k, cfg.stride, k // 2,
                                     groups=cin, bias=False)
            self.bn1 = nn.BatchNorm2d(cin)
            self.conv_pw = nn.Conv2d(cin, cfg.out_ch, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cfg.out_ch)
            self.act = act_fn(cfg.act)
            self.has_skip = cfg.stride == 1 and cin == cfg.out_ch

        def forward(self, x):
            sc = x
            y = self.act(self.bn1(self.conv_dw(x)))
            y = self.bn2(self.conv_pw(y))
            return y + sc if self.has_skip else y

    class InvertedResidual(nn.Module):
        def __init__(self, cfg, cin):
            super().__init__()
            k = cfg.kernel
            self.conv_pw = nn.Conv2d(cin, cfg.exp_ch, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cfg.exp_ch)
            self.conv_dw = nn.Conv2d(cfg.exp_ch, cfg.exp_ch, k, cfg.stride,
                                     k // 2, groups=cfg.exp_ch, bias=False)
            self.bn2 = nn.BatchNorm2d(cfg.exp_ch)
            self.se = (SE(cfg.exp_ch, _make_divisible(cfg.exp_ch / 4))
                       if cfg.use_se else None)
            self.conv_pwl = nn.Conv2d(cfg.exp_ch, cfg.out_ch, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cfg.out_ch)
            self.act = act_fn(cfg.act)
            self.has_skip = cfg.stride == 1 and cin == cfg.out_ch

        def forward(self, x):
            sc = x
            y = self.act(self.bn1(self.conv_pw(x)))
            y = self.act(self.bn2(self.conv_dw(y)))
            if self.se is not None:
                y = self.se(y)
            y = self.bn3(self.conv_pwl(y))
            return y + sc if self.has_skip else y

    class ConvBnAct(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)

        def forward(self, x):
            return F.hardswish(self.bn1(self.conv(x)))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_stem = nn.Conv2d(in_chans, 16, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(16)
            stages = []
            cin = 16
            for si, stage in enumerate(_STAGES):
                blocks = []
                for cfg in stage:
                    blocks.append(DepthwiseSeparable(cfg, cin) if si == 0
                                  else InvertedResidual(cfg, cin))
                    cin = cfg.out_ch
                stages.append(nn.ModuleList(blocks))
            stages.append(nn.ModuleList([ConvBnAct(cin, 960)]))
            self.blocks = nn.ModuleList(stages)
            self.conv_head = nn.Conv2d(960, 1280, 1, bias=True)

        def forward(self, x, head=False):
            x = F.hardswish(self.bn1(self.conv_stem(x)))
            for stage in self.blocks:
                for block in stage:
                    x = block(x)
            if head:
                x = F.hardswish(self.conv_head(x))
            return x

    return Net()


def _randomize_bn_stats(net):
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, (torch_nn.BatchNorm2d, torch_nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)


def test_mobilenetv3_port_full_forward():
    """End-to-end ≤1e-4 parity for the MobileNetV3 port, exercising the
    stage-0 DepthwiseSeparable remap (timm_port.py stage-0 branch), SE
    blocks, hardswish, and the conv_head path."""
    torch.manual_seed(0)
    net = _torch_mobilenetv3_features().eval()
    _randomize_bn_stats(net)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables = port_mobilenetv3(sd)

    x = np.random.default_rng(2).standard_normal((2, 64, 64, 3)).astype(
        np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    model = MobileNetV3Large()
    with torch.no_grad():
        golden_full = net(xt).numpy()
        golden_head = net(xt, head=True).numpy()
    ours_full = model.apply(variables, jnp.asarray(x), train=False,
                            mode="full")
    ours_head = model.apply(variables, jnp.asarray(x), train=False,
                            mode="head")
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours_full), (0, 3, 1, 2)), golden_full,
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours_head), (0, 3, 1, 2)), golden_head,
        atol=1e-4, rtol=1e-4)


def test_mobilenetv3_port_in_chans_13():
    """EuroSAT 13-band adaptation: port with in_chans=13 must equal a torch
    net whose stem filters got the identical repeat+rescale adaptation
    (timm's in_chans behavior, texture_pooling.py:19)."""
    torch.manual_seed(1)
    net3 = _torch_mobilenetv3_features().eval()
    _randomize_bn_stats(net3)
    sd = {k: v.detach().numpy() for k, v in net3.state_dict().items()}
    variables = port_mobilenetv3(sd, in_chans=13)

    net13 = _torch_mobilenetv3_features(in_chans=13).eval()
    net13.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()
         if k != "conv_stem.weight"}, strict=False)
    stem13 = adapt_in_chans(np.transpose(sd["conv_stem.weight"],
                                         (2, 3, 1, 0)), 13)
    with torch.no_grad():
        net13.conv_stem.weight.copy_(
            torch.from_numpy(np.transpose(stem13, (3, 2, 0, 1))))

    x = np.random.default_rng(3).standard_normal((2, 64, 64, 13)).astype(
        np.float32)
    with torch.no_grad():
        golden = net13(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ours = MobileNetV3Large().apply(variables, jnp.asarray(x), train=False,
                                    mode="full")
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), golden,
        atol=1e-4, rtol=1e-4)


def _torch_vit_tiny(depth=12, d=192, heads=3, in_chans=3):
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(d, eps=1e-6)
            self.norm2 = nn.LayerNorm(d, eps=1e-6)
            self.fc1 = nn.Linear(d, 4 * d)
            self.fc2 = nn.Linear(4 * d, d)
            self.qkv = nn.Linear(d, 3 * d)
            self.proj = nn.Linear(d, d)

        def forward(self, x):
            b, t, _ = x.shape
            hd = d // heads
            y = self.norm1(x)
            qkv = self.qkv(y).reshape(b, t, 3, heads, hd).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(dim=-1)
            x = x + self.proj((att @ v).transpose(1, 2).reshape(b, t, d))
            y = self.norm2(x)
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(y)))

    class Attn(nn.Module):  # container so names read blocks.i.attn.qkv.*
        def __init__(self, blk):
            super().__init__()
            self.qkv = blk.qkv
            self.proj = blk.proj

    class Mlp(nn.Module):
        def __init__(self, blk):
            super().__init__()
            self.fc1 = blk.fc1
            self.fc2 = blk.fc2

    class NamedBlock(nn.Module):
        def __init__(self):
            super().__init__()
            inner = Block()
            self.norm1 = inner.norm1
            self.norm2 = inner.norm2
            self.attn = Attn(inner)
            self.mlp = Mlp(inner)
            self._inner = [inner]  # plain list: not registered twice

        def forward(self, x):
            return self._inner[0](x)

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(in_chans, d, 16, 16)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
            self.pos_embed = nn.Parameter(torch.randn(1, 197, d) * 0.02)
            self.blocks = nn.ModuleList([NamedBlock() for _ in range(depth)])
            self.norm = nn.LayerNorm(d, eps=1e-6)

        def forward(self, x):
            b = x.shape[0]
            x = self.patch_embed.proj(x)          # (B, D, 14, 14)
            x = x.flatten(2).transpose(1, 2)      # (B, 196, D)
            x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
            x = x + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)

    return Net()


def test_vit_port_full_forward():
    """End-to-end ≤1e-4 parity for the full 12-block ViT-Tiny port at
    224px (previously only one encoder block was checked)."""
    from neighbour_feature_pooling_tpu.models.backbones.vit import (
        vit_tiny_patch16_224)

    torch.manual_seed(2)
    net = _torch_vit_tiny().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables = port_vit(sd, depth=12, num_heads=3)

    x = np.random.default_rng(4).standard_normal((2, 224, 224, 3)).astype(
        np.float32)
    with torch.no_grad():
        golden = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ours = vit_tiny_patch16_224().apply(variables, jnp.asarray(x),
                                        train=False)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-4, rtol=1e-4)


def test_vit_port_in_chans_13():
    from neighbour_feature_pooling_tpu.models.backbones.vit import (
        vit_tiny_patch16_224)

    torch.manual_seed(3)
    net3 = _torch_vit_tiny(depth=2).eval()
    sd = {k: v.detach().numpy() for k, v in net3.state_dict().items()}
    variables = port_vit(sd, depth=2, num_heads=3, in_chans=13)

    net13 = _torch_vit_tiny(depth=2, in_chans=13).eval()
    net13.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()
         if k != "patch_embed.proj.weight"}, strict=False)
    k13 = adapt_in_chans(np.transpose(sd["patch_embed.proj.weight"],
                                      (2, 3, 1, 0)), 13)
    with torch.no_grad():
        net13.patch_embed.proj.weight.copy_(
            torch.from_numpy(np.transpose(k13, (3, 2, 0, 1))))

    x = np.random.default_rng(5).standard_normal((2, 224, 224, 13)).astype(
        np.float32)
    with torch.no_grad():
        golden = net13(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    from neighbour_feature_pooling_tpu.models.backbones.vit import ViT
    ours = ViT(depth=2).apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-4, rtol=1e-4)
