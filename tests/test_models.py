"""Model zoo smoke tests: construction, forward shapes, jit, gradients.

The reference's de-facto unit test is a dummy forward at construction time
(SURVEY §4); here every registered (model_type × variant) combination is
exercised with small inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neighbour_feature_pooling_tpu.models import (
    MODEL_VARIANTS,
    NUM_FTRS,
    get_model,
)

NUM_CLASSES = 5


def _init_and_forward(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, x, train=False)
    extra = {"dropout": jax.random.PRNGKey(1)} if train else {}
    out = model.apply(variables, x, train=train, rngs=extra,
                      mutable=["batch_stats"] if train else False)
    if train:
        out = out[0]
    return out, variables


# Small inputs keep CPU runtime sane; ViT needs 224 (fixed patch grid is not
# required — pos embed slices — but tokens_to_map needs a square count).
_INPUT_SIZE = {"resnet18": 64, "resnet50": 64, "mobilenetv3": 64,
               "vittiny": 96}

ALL_COMBOS = [(mt, v) for mt, variants in MODEL_VARIANTS.items()
              for v in variants]


@pytest.mark.parametrize("model_type,variant", ALL_COMBOS)
def test_forward_shape(model_type, variant):
    s = _INPUT_SIZE[model_type]
    # fractal box-counting needs a >=6x6 final map (input >= 192 at /32)
    if variant == "texture_fractal" and model_type != "vittiny":
        s = 192
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, s, s, 3)).astype(np.float32))
    # CLI-padding legacy variants default to padding=0, which needs ≥3×3
    # feature maps; small test inputs produce 2×2, so use "same" padding.
    kwargs = {}
    if variant in ("nfp_conv_only", "nfp_conv_mlp", "nfp_at_layer",
                   "similarity_aware_pooling"):
        kwargs["nfp_padding"] = 1
    model = get_model(model_type, variant, NUM_CLASSES, **kwargs)
    logits, variables = _init_and_forward(model, x)
    assert logits.shape == (2, NUM_CLASSES), (model_type, variant)
    assert bool(jnp.all(jnp.isfinite(logits))), (model_type, variant)


def test_train_mode_and_grad():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray([0, 3])
    model = get_model("resnet18", "texture_nfp", NUM_CLASSES)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        onehot = jax.nn.one_hot(y, NUM_CLASSES)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert bool(jnp.isfinite(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    # gradient reaches the backbone through the NFP custom-vjp
    g_bb = jax.tree_util.tree_leaves(grads["backbone"])
    assert max(float(jnp.abs(g).max()) for g in g_bb) > 0


def test_13_channel_input():
    # EuroSAT multispectral: 13 input channels (demo.py:224-229)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 64, 64, 13)).astype(np.float32))
    model = get_model("resnet18", "gap_only", 10, num_input_channels=13)
    logits, _ = _init_and_forward(model, x)
    assert logits.shape == (1, 10)


def test_feature_dims_match_reference():
    # demo.py:271-278
    assert NUM_FTRS == {"resnet18": 512, "resnet50": 2048,
                        "mobilenetv3": 960, "vittiny": 192}


def test_backbone_feature_shapes():
    from neighbour_feature_pooling_tpu.models.backbones import (
        MobileNetV3Large, resnet18, vit_tiny_patch16_224)

    x = jnp.zeros((1, 224, 224, 3))
    rn = resnet18()
    v = rn.init(jax.random.PRNGKey(0), x)
    f = rn.apply(v, x)
    assert f.shape == (1, 7, 7, 512)

    mn = MobileNetV3Large()
    v = mn.init(jax.random.PRNGKey(0), x)
    f = mn.apply(v, x)
    assert f.shape == (1, 7, 7, 960)
    feats = mn.apply(v, x, mode="features")
    assert [t.shape for t in feats] == [
        (1, 112, 112, 16), (1, 56, 56, 24), (1, 28, 28, 40),
        (1, 14, 14, 112), (1, 7, 7, 960)]

    vit = vit_tiny_patch16_224()
    v = vit.init(jax.random.PRNGKey(0), x)
    t = vit.apply(v, x)
    assert t.shape == (1, 197, 192)


def test_vit_fused_attention_equivalence():
    """FusedAttention (fused-QKV matmul) must equal flax's
    MultiHeadDotProductAttention given the SAME parameter tree, and the
    seq_align token padding (197 → 200, pad keys masked) must not change
    the output."""
    import jax
    import jax.numpy as jnp

    from neighbour_feature_pooling_tpu.models.backbones.vit import ViT

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 96, 96, 3)).astype(np.float32))
    flaxattn = ViT(fused_attn=False)
    fused = ViT(fused_attn=True, seq_align=0)
    aligned = ViT(fused_attn=True, seq_align=8)
    v = flaxattn.init({"params": jax.random.PRNGKey(0)}, x[:1])
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(
                fused.init({"params": jax.random.PRNGKey(0)}, x[:1])))
    y0 = flaxattn.apply(v, x)
    y1 = fused.apply(v, x)
    y2 = aligned.apply(v, x)
    assert y0.shape == y1.shape == y2.shape == (2, 37, 192)  # 6²+1 tokens
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)
    # from-scratch init must match flax DenseGeneral's FLATTENED-fan
    # lecun_normal (plain 3-D lecun_normal would be num_heads× too small)
    vf = fused.init({"params": jax.random.PRNGKey(1)}, x[:1])
    for mod in (v, vf):
        k = np.asarray(mod["params"]["block_0"]["attn"]["query"]["kernel"])
        assert abs(k.std() / (1.0 / np.sqrt(192)) - 1.0) < 0.12, k.std()


def test_fused_stem_tail_op_matches_stock():
    """ops.stem_pool.bn_relu_maxpool == stock bn+relu+maxpool in forward
    AND gradients, including adversarial tie inputs (quantized plateaus,
    all-negative windows) where SelectAndScatter's first-argmax routing
    must be reproduced exactly (round-2 VERDICT directive #5)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import flax.linen as nn

    from neighbour_feature_pooling_tpu.ops.stem_pool import bn_relu_maxpool

    eps = 1e-5

    def stats(x):
        m = jnp.mean(x, (0, 1, 2))
        v = jnp.mean(jnp.square(x), (0, 1, 2)) - jnp.square(m)
        return m, v

    def stock(x, scale, bias):
        m, v = stats(x)
        a = (x - m) * lax.rsqrt(v + eps) * scale + bias
        z = jax.nn.relu(a)
        return nn.max_pool(z, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    def fused(x, scale, bias):
        m, v = stats(x)
        return bn_relu_maxpool(x, scale=scale, bias=bias, mean=m, var=v,
                               eps=eps)

    rng = np.random.default_rng(5)
    cases = {
        "random": rng.standard_normal((3, 14, 14, 8)),
        # quantized values -> many exact in-window ties after the affine
        "ties": np.round(rng.standard_normal((2, 12, 12, 4)) * 2) / 2,
        # huge negative shift -> whole windows of relu zeros (max tie at 0)
        "allneg": rng.standard_normal((2, 10, 10, 4)) - 50.0,
        # constant plateaus
        "const": np.zeros((1, 8, 8, 2)),
        # odd spatial size exercises the pool geometry
        "odd": np.round(rng.standard_normal((2, 9, 11, 4)), 1),
    }
    for name, xnp in cases.items():
        x = jnp.asarray(xnp.astype(np.float32))
        c = x.shape[-1]
        scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.standard_normal(
            stock(x, scale, bias).shape).astype(np.float32))

        y0 = stock(x, scale, bias)
        y1 = fused(x, scale, bias)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-6, err_msg=name)

        g0 = jax.grad(lambda *a: jnp.sum(stock(*a) * w),
                      argnums=(0, 1, 2))(x, scale, bias)
        g1 = jax.grad(lambda *a: jnp.sum(fused(*a) * w),
                      argnums=(0, 1, 2))(x, scale, bias)
        for a0, a1, tag in zip(g0, g1, ("dx", "dscale", "dbias")):
            np.testing.assert_allclose(
                np.asarray(a0), np.asarray(a1), atol=5e-5, rtol=1e-4,
                err_msg=f"{name}:{tag}")


def test_fused_stem_tail_model_equivalence():
    """ResNet18 with stem_fused=True: identical variable tree, matching
    train forward/grads/batch-stat updates, and bit-parity eval path."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    base = get_model("resnet18", "gap_only", 3)
    fused = get_model("resnet18", "gap_only", 3, stem_fused=True)
    v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    # eval forward: same normalize math (fp32), equal outputs
    np.testing.assert_allclose(
        np.asarray(base.apply(v, x, train=False)),
        np.asarray(fused.apply(v, x, train=False)), atol=1e-6)

    # train forward + grads + batch_stats updates
    def loss(model, vv):
        out, mut = model.apply(vv, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
        return jnp.sum(out ** 2), mut["batch_stats"]

    (l0, bs0), g0 = jax.value_and_grad(
        lambda vv: loss(base, vv), has_aux=True)(v)
    (l1, bs1), g1 = jax.value_and_grad(
        lambda vv: loss(fused, vv), has_aux=True)(v)
    assert abs(float(l0) - float(l1)) < 1e-4 * max(1.0, abs(float(l0)))
    for (p0, a0), (p1, a1) in zip(
            jax.tree_util.tree_leaves_with_path(bs0),
            jax.tree_util.tree_leaves_with_path(bs1)):
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                   atol=1e-5, rtol=1e-4, err_msg=str(p0))
    flat0 = jax.tree_util.tree_leaves_with_path(g0["params"])
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1["params"]))
    for path, a in flat0:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat1[path]), atol=1e-3, rtol=1e-3,
            err_msg=str(path))


def test_stem_s2d_equivalence():
    """The space-to-depth stem (stem_s2d=True) is the same arithmetic as
    the direct 7×7/s2 conv: identical parameter tree, matching outputs and
    gradients from shared variables, for ResNet18/50, odd-size fallback,
    and in_chans=13."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    for mt in ("resnet18", "resnet50"):
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3))
                        .astype(np.float32))
        base = get_model(mt, "texture_nfp", 3)
        s2d = get_model(mt, "texture_nfp", 3, stem_s2d=True)
        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)

        def loss(variables, model):
            return jnp.sum(model.apply(variables, x, train=False) ** 2)

        l0, g0 = jax.value_and_grad(lambda vv: loss(vv, base))(v)
        l1, g1 = jax.value_and_grad(lambda vv: loss(vv, s2d))(v)
        assert abs(float(l0) - float(l1)) < 1e-3 * max(1.0, abs(float(l0)))
        flat0 = jax.tree_util.tree_leaves_with_path(g0["params"])
        flat1 = dict(jax.tree_util.tree_leaves_with_path(g1["params"]))
        for path, a in flat0:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(flat1[path]), atol=1e-3,
                rtol=1e-3, err_msg=f"{mt} {path}")

    # odd spatial size: falls back to the direct conv, still works
    xo = jnp.asarray(rng.standard_normal((1, 63, 63, 3)).astype(np.float32))
    s2d = get_model("resnet18", "gap_only", 3, stem_s2d=True)
    v = s2d.init({"params": jax.random.PRNGKey(0)}, xo, train=False)
    assert v["params"]["backbone"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    s2d.apply(v, xo, train=False)

    # 13-band input keeps the (7,7,13,64) parameter shape
    x13 = jnp.asarray(rng.standard_normal((1, 32, 32, 13)).astype(np.float32))
    m13 = get_model("resnet18", "gap_only", 3, num_input_channels=13,
                    stem_s2d=True)
    v13 = m13.init({"params": jax.random.PRNGKey(0)}, x13, train=False)
    assert v13["params"]["backbone"]["conv1"]["kernel"].shape == (7, 7, 13, 64)


def test_remat_gradients_match():
    """remat=True must be numerically a no-op: same loss, same gradients
    (it only changes what the backward pass recomputes), for all three
    backbone families."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    for mt in ("resnet18", "mobilenetv3", "vittiny"):
        base = get_model(mt, "gap_only", 3)
        rem = get_model(mt, "gap_only", 3, remat=True)
        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)

        def loss(variables, model):
            out, _ = model.apply(variables, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)},
                                 mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        l0, g0 = jax.value_and_grad(lambda vv: loss(vv, base))(v)
        l1, g1 = jax.value_and_grad(lambda vv: loss(vv, rem))(v)
        assert abs(float(l0) - float(l1)) < 1e-5, mt
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4,
                                       err_msg=mt)


def test_remat_conv_out_policy_matches_stock():
    """remat_policy='conv_out' (save only tagged conv outputs, recompute
    BN/ReLU — the round-5 traffic-vs-FLOPs lever) must also be numerically
    a no-op vs no remat, for both ResNet block types."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    for mt in ("resnet18", "resnet50"):
        base = get_model(mt, "texture_nfp", 3)
        rem = get_model(mt, "texture_nfp", 3, remat=True,
                        remat_policy="conv_out")

        v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)

        def loss(variables, model):
            out, _ = model.apply(variables, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)},
                                 mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        l0, g0 = jax.value_and_grad(lambda vv: loss(vv, base))(v)
        l1, g1 = jax.value_and_grad(lambda vv: loss(vv, rem))(v)
        assert abs(float(l0) - float(l1)) < 1e-5, mt
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4, err_msg=mt)
    with pytest.raises(ValueError, match="remat_policy"):
        bad = get_model("resnet18", "gap_only", 3, remat=True,
                        remat_policy="nope")
        bad.init({"params": jax.random.PRNGKey(0)}, x, train=False)


def test_dw_shifted_matches_conv():
    """The shifted-slice depthwise conv (DepthwiseConvShifted, the retired
    round-3 spike kept behind NFP_TPU_DW_SHIFTED=1) is parameter-compatible
    and numerically equivalent to ``nn.Conv(feature_group_count=C)`` —
    forward and gradients — across the kernel/stride combinations
    MobileNetV3-Large actually uses."""
    import flax.linen as nn

    from neighbour_feature_pooling_tpu.models.backbones.mobilenetv3 import (
        DepthwiseConvShifted,
    )

    rng = np.random.default_rng(3)
    for k, s, c, h in [(3, 1, 16, 14), (3, 2, 64, 15),
                       (5, 1, 120, 14), (5, 2, 672, 13)]:
        x = jnp.asarray(rng.standard_normal((2, h, h, c)).astype(np.float32))
        ref = nn.Conv(c, (k, k), strides=s, padding=k // 2,
                      feature_group_count=c, use_bias=False)
        shf = DepthwiseConvShifted(k, s)
        v = ref.init(jax.random.PRNGKey(0), x)
        # same param tree: the conv variables apply to the shifted module
        y_ref = ref.apply(v, x)
        y_shf = shf.apply(v, x)
        assert y_ref.shape == y_shf.shape
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_shf),
                                   atol=2e-6, rtol=1e-5)

        g_ref = jax.grad(lambda p: jnp.sum(
            jnp.sin(ref.apply(p, x))))(v)["params"]["kernel"]
        g_shf = jax.grad(lambda p: jnp.sum(
            jnp.sin(shf.apply(p, x))))(v)["params"]["kernel"]
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_shf),
                                   atol=5e-5, rtol=1e-4)


def test_dw_shifted_env_toggle_same_tree(monkeypatch):
    """NFP_TPU_DW_SHIFTED=0 falls back to nn.Conv with an identical variable
    tree, so ported timm weights load on either path."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))

    monkeypatch.setenv("NFP_TPU_DW_SHIFTED", "0")
    m0 = get_model("mobilenetv3", "gap_only", 3)
    v0 = m0.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y0 = m0.apply(v0, x, train=False)

    monkeypatch.setenv("NFP_TPU_DW_SHIFTED", "1")
    m1 = get_model("mobilenetv3", "gap_only", 3)
    y1 = m1.apply(v0, x, train=False)  # same variables, shifted path

    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(
                m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-5, rtol=1e-4)
