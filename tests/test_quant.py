"""int8 post-training-quantization tests (quant.py).

The reference has no quantized inference; these tests pin the rebuild's
int8 serving tier: exact quant math vs a numpy oracle, eligibility policy
(depthwise/fc/small layers stay fp32), model-level closeness for every
backbone family, and the Predictor/export integration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from neighbour_feature_pooling_tpu.quant import (
    QuantConfig, _quantize, make_int8_interceptor, quantized_apply)


def _np_quant(x, axes=None):
    amax = (np.max(np.abs(x)) if axes is None
            else np.max(np.abs(x), axis=axes, keepdims=True))
    scale = np.maximum(amax, 1e-12) / 127.0
    # jnp.round and np.round are both round-half-to-even
    q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


class TestQuantMath:
    def test_quantize_matches_numpy(self):
        x = np.random.default_rng(0).standard_normal((5, 7)).astype(
            np.float32) * 3.7
        q, s = _quantize(jnp.asarray(x))
        nq, ns = _np_quant(x)
        np.testing.assert_array_equal(np.asarray(q), nq)
        np.testing.assert_allclose(float(s), float(ns), rtol=1e-6)

    def test_quantize_per_channel(self):
        w = np.random.default_rng(1).standard_normal((3, 3, 8, 4)).astype(
            np.float32)
        q, s = _quantize(jnp.asarray(w), axes=(0, 1, 2))
        nq, ns = _np_quant(w, axes=(0, 1, 2))
        np.testing.assert_array_equal(np.asarray(q), nq)
        np.testing.assert_allclose(np.asarray(s), ns, rtol=1e-6)

    def test_quantize_zero_tensor(self):
        q, s = _quantize(jnp.zeros((4, 4)))
        assert np.all(np.asarray(q) == 0) and np.isfinite(float(s))


class _OneConv(nn.Module):
    strides: int = 2

    @nn.compact
    def __call__(self, x):
        return nn.Conv(4, (3, 3), strides=self.strides, padding=1,
                       use_bias=True, name="conv")(x)


class _OneDense(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(5, name="dense")(x)


class TestIntConvOracle:
    def test_conv_int8_matches_numpy_oracle(self):
        """Quantized conv == naive numpy int32-accumulation conv, exactly."""
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 6, 6, 8)).astype(np.float32)
        m = _OneConv()
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(quantized_apply(
            m, v, jnp.asarray(x), config=QuantConfig(min_contraction=1)))

        w = np.asarray(v["params"]["conv"]["kernel"])   # (3,3,8,4)
        b = np.asarray(v["params"]["conv"]["bias"])
        wq, ws = _np_quant(w, axes=(0, 1, 2))
        xq, xs = _np_quant(x)
        xpad = np.zeros((1, 8, 8, 8), np.int32)
        xpad[:, 1:7, 1:7, :] = xq.astype(np.int32)
        out = np.zeros((1, 3, 3, 4), np.int32)
        for i in range(3):
            for j in range(3):
                patch = xpad[:, 2 * i: 2 * i + 3, 2 * j: 2 * j + 3, :]
                out[:, i, j, :] = np.einsum(
                    "bhwc,hwco->bo", patch, wq.astype(np.int32))
        want = out.astype(np.float32) * (xs * ws.reshape(1, 1, 1, 4)) + b
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_dense_int8_matches_numpy_oracle(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        m = _OneDense()
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(quantized_apply(
            m, v, jnp.asarray(x), config=QuantConfig(min_contraction=1)))
        w = np.asarray(v["params"]["dense"]["kernel"])
        b = np.asarray(v["params"]["dense"]["bias"])
        wq, ws = _np_quant(w, axes=(0,))
        xq, xs = _np_quant(x)
        want = (xq.astype(np.int32) @ wq.astype(np.int32)).astype(
            np.float32) * (xs * ws.reshape(-1)) + b
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


class TestEligibility:
    def test_depthwise_and_small_layers_stay_fp32(self):
        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), padding=1, feature_group_count=8,
                            name="dw")(x)          # depthwise: skip
                x = nn.Conv(16, (1, 1), name="tiny")(x)  # 8 < 64: skip
                return x

        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 5, 5, 8)), jnp.float32)
        m = M()
        v = m.init(jax.random.PRNGKey(0), x)
        replaced = []
        with nn.intercept_methods(make_int8_interceptor(
                QuantConfig(min_contraction=64), replaced)):
            got = m.apply(v, x)
        assert replaced == []
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(m.apply(v, x)))

    def test_fc_head_skipped_but_backbone_quantized(self):
        from neighbour_feature_pooling_tpu.models import get_model

        model = get_model("resnet18", "gap_only", 3)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 32, 32, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        replaced = []
        with nn.intercept_methods(make_int8_interceptor(QuantConfig(),
                                                        replaced)):
            model.apply(v, x, train=False)
        names = {p[-1] for p in replaced}
        assert "fc" not in names
        assert len(replaced) >= 15  # the resnet18 conv stack


# Head/backbone pairings avoid a measurement pathology, not a quantizer
# one: at random init MobileNetV3's late activations sit at amax ~1e-4,
# and the lacunarity head's ratio-of-moments on those features yields
# logits with norm ~1e-11 — relative logit error there is pure noise
# (per-layer int8 error is ≤2% on every MNv3 layer; see quant.py). So
# lacunarity is exercised on ResNet18 (O(1) activations) and MNv3 on the
# scale-invariant cosine NFP head.
MODEL_CASES = [
    ("resnet18", "texture_lacunarity", 64, 20),
    ("mobilenetv3", "texture_nfp", 64, 25),
    ("vittiny", "texture_deepten", 64, 20),
]


class TestModelLevel:
    @pytest.mark.parametrize("mtype,variant,size,min_quant", MODEL_CASES)
    def test_int8_forward_close_to_fp32(self, mtype, variant, size,
                                        min_quant):
        from neighbour_feature_pooling_tpu.models import get_model

        model = get_model(mtype, variant, 7)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, size, size, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x[:1],
                       train=False)
        ref = np.asarray(model.apply(v, x, train=False))
        replaced = []
        with nn.intercept_methods(make_int8_interceptor(QuantConfig(),
                                                        replaced)):
            got = np.asarray(model.apply(v, x, train=False))
        assert len(replaced) >= min_quant, (mtype, len(replaced))
        rel = (np.linalg.norm(got - ref)
               / max(np.linalg.norm(ref), 1e-12))
        assert rel < 0.12, f"{mtype}: rel logit err {rel}"


class TestPrequantize:
    """Weight pre-quantization (quant.prequantize_weights): the baked
    ``"int8w"`` collection must reproduce the dynamic in-jit weight
    quantization (same values; scales may drift 1 ulp from amax
    reassociation), and the Predictor must install + serve it."""

    def test_bit_identical_to_dynamic(self):
        from neighbour_feature_pooling_tpu.models import get_model
        from neighbour_feature_pooling_tpu.quant import prequantize_weights

        model = get_model("resnet18", "texture_nfp", 3)
        x = jnp.asarray(np.random.default_rng(3)
                        .standard_normal((2, 32, 32, 3)), jnp.float32)
        v = dict(model.init({"params": jax.random.PRNGKey(0)}, x[:1],
                            train=False))
        dyn = np.asarray(quantized_apply(model, v, x, train=False))
        qw = prequantize_weights(v)
        pre = np.asarray(quantized_apply(model, {**v, "int8w": qw}, x,
                                         train=False))
        # same _quantize on the same values, but prequantize runs its
        # own jitted sweep whose amax reductions XLA may reassociate
        # differently from the in-forward dynamic ones — scales can
        # differ by 1 ulp, logits by ~1e-7
        np.testing.assert_allclose(dyn, pre, atol=1e-6, rtol=1e-6)

    def test_collection_respects_policy(self):
        from neighbour_feature_pooling_tpu.models import get_model
        from neighbour_feature_pooling_tpu.quant import prequantize_weights

        model = get_model("resnet18", "gap_only", 3)
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 32, 32, 3)), train=False)
        qw = prequantize_weights(dict(v))

        paths = []

        def flatten(tree, path):
            for k, sub in tree.items():
                if k == "wq":
                    paths.append(path)
                elif isinstance(sub, dict):
                    flatten(sub, path + (k,))

        flatten(qw, ())
        assert len(paths) >= 15          # the resnet18 conv stack
        assert all("fc" not in p for p in paths)   # classifier stays fp32
        for p in paths:                  # baked tensors are s8 + f32 scale
            node = qw
            for comp in p:
                node = node[comp]
            assert node["wq"].dtype == jnp.int8
            assert node["ws"].dtype == jnp.float32

    def test_predictor_installs_and_matches_dynamic(self):
        from neighbour_feature_pooling_tpu.serve import Predictor

        kw = dict(num_classes=4, batch_size=4, input_size=32,
                  resize_size=36, quantize="int8")
        pre = Predictor("resnet18", "gap_only", **kw)
        assert "int8w" in pre._variables
        dyn = Predictor("resnet18", "gap_only", **kw)
        dyn._variables.pop("int8w")      # force the in-jit dynamic path
        dyn._build_forward()             # rebuild: full tree, no int8w
        rng = np.random.default_rng(0)
        imgs = [rng.random((36, 36, 3)).astype(np.float32)
                for _ in range(3)]
        a = pre.predict(imgs)["probabilities"]
        b = dyn.predict(imgs)["probabilities"]
        # not bit-equal here: the dynamic path's amax reductions run
        # inside jit where XLA may reassociate, so the scale can differ
        # by 1 ulp from the eagerly prebaked one
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_mixed_tier_leaves_spatial_convs_float(self):
        """quantize_spatial=False: only GEMM-shaped layers (1×1 convs,
        dense) are replaced — spatial kernels are neither baked nor
        stripped, and the predictor still serves."""
        from neighbour_feature_pooling_tpu.serve import Predictor

        mixed = Predictor("resnet50", "gap_only", num_classes=4,
                          batch_size=2, input_size=32, resize_size=36,
                          quantize="int8", quantize_spatial=False)

        def walk(tree, path=()):
            for k, v in tree.items():
                if isinstance(v, dict) or hasattr(v, "items"):
                    yield from walk(v, path + (k,))
                else:
                    yield path + (k,), v

        baked = [p for p, _ in walk(mixed._variables["int8w"])
                 if p[-1] == "wq"]
        assert baked                                    # 1×1s quantized
        # every baked kernel is GEMM-shaped in the param tree
        for p in baked:
            node = mixed._variables["params"]
            for comp in p[:-1]:
                node = node[comp]
            k = node["kernel"]
            assert k.ndim == 2 or all(d == 1 for d in k.shape[:-2]), p
        # spatial kernels survive in the serving tree
        served = {p for p, _ in walk(mixed._serve_variables["params"])}
        spatial = [p for p, v in walk(mixed._variables["params"])
                   if p[-1] == "kernel" and v.ndim == 4
                   and any(d != 1 for d in v.shape[:-2])]
        assert spatial and all(p in served for p in spatial)
        out = mixed.predict([np.zeros((36, 36, 3), np.float32)])
        assert np.all(np.isfinite(out["probabilities"]))

    def test_serving_tree_strips_dead_fp32_kernels(self):
        """The serving variables drop the fp32 kernel of every layer the
        quantized program replaced (its int8w twin is what the forward
        reads); biases, BN stats and ineligible layers stay."""
        from neighbour_feature_pooling_tpu.serve import Predictor

        pre = Predictor("resnet18", "gap_only", num_classes=4,
                        batch_size=4, input_size=32, resize_size=36,
                        quantize="int8")

        def count(tree, name):
            n = 0
            for k, v in tree.items():
                if isinstance(v, dict) or hasattr(v, "items"):
                    n += count(v, name)
                elif k == name:
                    n += 1
            return n

        full = count(pre._variables["params"], "kernel")
        served = count(pre._serve_variables["params"], "kernel")
        baked = count(pre._variables["int8w"], "wq")
        assert baked >= 15
        assert served == full - baked          # exactly the baked ones
        # batch_stats intact, and predict still runs on the stripped tree
        assert pre._serve_variables["batch_stats"]
        out = pre.predict([np.random.default_rng(0)
                           .random((36, 36, 3)).astype(np.float32)])
        assert np.all(np.isfinite(out["probabilities"]))


class TestPredictorIntegration:
    def test_predictor_int8_runs_and_tracks_fp32(self):
        from neighbour_feature_pooling_tpu.serve import Predictor

        kw = dict(num_classes=4, batch_size=4, input_size=32,
                  resize_size=36)
        fp = Predictor("resnet18", "texture_nfp", **kw)
        q = Predictor("resnet18", "texture_nfp", quantize="int8", **kw)
        # same random init on both predictors (rebuild so the baked
        # int8w weights and the stripped serving tree track the swap)
        from neighbour_feature_pooling_tpu.quant import prequantize_weights

        q._variables = dict(fp._variables)
        q._variables["int8w"] = prequantize_weights(q._variables)
        q._build_forward()
        rng = np.random.default_rng(0)
        imgs = [rng.random((40, 40, 3)).astype(np.float32)
                for _ in range(5)]
        a, b = fp.predict(imgs), q.predict(imgs)
        assert b["probabilities"].shape == (5, 4)
        assert np.mean(np.abs(a["probabilities"]
                              - b["probabilities"])) < 0.05

    def test_predictor_rejects_unknown_mode(self):
        from neighbour_feature_pooling_tpu.serve import Predictor

        with pytest.raises(ValueError):
            Predictor("resnet18", "gap_only", num_classes=2,
                      quantize="fp8")

    def test_int8_export_round_trip(self, tmp_path):
        """The AOT artifact freezes the QUANTIZED program: reload matches
        the live int8 predictor exactly."""
        from neighbour_feature_pooling_tpu.serve import (
            Predictor, export_predictor, load_exported)

        pred = Predictor("resnet18", "gap_only", num_classes=3,
                         batch_size=4, input_size=32, resize_size=36,
                         quantize="int8")
        rng = np.random.default_rng(1)
        imgs = [rng.random((36, 36, 3)).astype(np.float32)
                for _ in range(6)]
        want = pred.predict(imgs)
        path = str(tmp_path / "artifact_int8")
        export_predictor(pred, path)
        got = load_exported(path).predict(imgs)
        np.testing.assert_allclose(got["probabilities"],
                                   want["probabilities"], atol=1e-5)
        np.testing.assert_array_equal(got["label"], want["label"])


class _GemmRouteModel(nn.Module):
    """1x1 convs (plain + strided) and a Dense — the MXU-GEMM-routable set."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(96, (1, 1), name="pw")(x)
        x = nn.Conv(128, (1, 1), strides=2, name="pw_s2")(x)
        x = nn.Conv(64, (3, 3), padding=1, name="spatial")(x)
        x = nn.Conv(64, (3, 3), strides=2, padding="SAME",
                    name="spatial_s2")(x)  # s2d-rewritten conv route
        x = x.mean(axis=(1, 2))
        return nn.Dense(80, name="proj")(x)


class TestMXUGemmRoute:
    """cfg.use_mxu_gemm routes dense/1x1-conv contractions through the
    Pallas int8 GEMM (ops/int8_gemm.py). s32 accumulation is exact, so the
    two routes must agree bit-for-bit."""

    def test_gemm_route_bit_identical_to_xla_route(self):
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 8, 8, 64)), jnp.float32)
        m = _GemmRouteModel()
        v = m.init(jax.random.PRNGKey(0), x)
        outs = {}
        for mxu in (False, True):
            cfg = QuantConfig(min_contraction=1, use_mxu_gemm=mxu)
            outs[mxu] = np.asarray(quantized_apply(m, v, x, config=cfg))
        np.testing.assert_array_equal(outs[True], outs[False])

    def test_layer_kernel_dispatch(self):
        """1x1 convs + dense -> int8_gemm; stride-1 spatial convs ->
        int8_conv2d; nothing falls through to the XLA conv."""
        from neighbour_feature_pooling_tpu import quant as q

        gemm_calls, conv_calls = [], []
        orig_g, orig_c = q.int8_gemm, q.int8_conv2d
        q.int8_gemm = lambda a, b, **kw: gemm_calls.append(
            a.shape) or orig_g(a, b, **kw)
        q.int8_conv2d = lambda x, w, **kw: conv_calls.append(
            w.shape) or orig_c(x, w, **kw)
        try:
            x = jnp.asarray(np.random.default_rng(1)
                            .standard_normal((1, 8, 8, 64)), jnp.float32)
            m = _GemmRouteModel()
            v = m.init(jax.random.PRNGKey(0), x)
            cfg = QuantConfig(min_contraction=1, use_mxu_gemm=True)
            quantized_apply(m, v, x, config=cfg)
        finally:
            q.int8_gemm, q.int8_conv2d = orig_g, orig_c
        assert len(gemm_calls) == 3          # pw, pw_s2, proj
        assert all(s[1] in (64, 96, 128) for s in gemm_calls)
        # spatial (stride 1) + spatial_s2 (strided -> conv route too)
        assert conv_calls == [(3, 3, 128, 64), (3, 3, 64, 64)]

    def test_resnet18_mxu_route_bit_identical(self):
        """Whole-model integration: every eligible ResNet18 layer through
        the Pallas kernels == the XLA int8 lowering, bit-for-bit."""
        from neighbour_feature_pooling_tpu.models import get_model

        model = get_model("resnet18", "gap_only", 3)
        x = jnp.asarray(np.random.default_rng(2)
                        .standard_normal((1, 32, 32, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        outs = {}
        for mxu in (False, True):
            cfg = QuantConfig(use_mxu_gemm=mxu)
            with nn.intercept_methods(make_int8_interceptor(cfg)):
                outs[mxu] = np.asarray(model.apply(v, x, train=False))
        np.testing.assert_array_equal(outs[True], outs[False])

    def test_vit_attention_projections_intercepted(self):
        """FusedAttention.proj (QKV-fused + out matmuls) quantizes via the
        method interceptor: 12 blocks x 2 projections on ViT-Tiny."""
        from neighbour_feature_pooling_tpu.models import get_model

        model = get_model("vittiny", "gap_only", 3)
        x = jnp.asarray(np.random.default_rng(3)
                        .standard_normal((1, 64, 64, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ref = np.asarray(model.apply(v, x, train=False))
        replaced = []
        with nn.intercept_methods(make_int8_interceptor(QuantConfig(),
                                                        replaced)):
            got = np.asarray(model.apply(v, x, train=False))
        proj = [p for p in replaced if p[-1].startswith("proj")]
        assert len(proj) == 24
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.12, rel

    def test_vit_proj_mxu_route_bit_identical(self):
        from neighbour_feature_pooling_tpu.models import get_model

        model = get_model("vittiny", "gap_only", 3)
        x = jnp.asarray(np.random.default_rng(4)
                        .standard_normal((1, 32, 32, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        outs = {}
        for mxu in (False, True):
            cfg = QuantConfig(use_mxu_gemm=mxu)
            with nn.intercept_methods(make_int8_interceptor(cfg)):
                outs[mxu] = np.asarray(model.apply(v, x, train=False))
        np.testing.assert_array_equal(outs[True], outs[False])


class TestCalibration:
    def test_calibrated_scales_cover_all_quantized_layers(self):
        from neighbour_feature_pooling_tpu.quant import calibrate_act_scales

        x = jnp.asarray(np.random.default_rng(5)
                        .standard_normal((2, 8, 8, 64)), jnp.float32)
        m = _GemmRouteModel()
        v = m.init(jax.random.PRNGKey(0), x)
        cfg = QuantConfig(min_contraction=1, use_mxu_gemm=False)
        scales = calibrate_act_scales(m, v, [x], config=cfg,
                                      apply_kwargs={})
        replaced = []
        with nn.intercept_methods(make_int8_interceptor(cfg, replaced)):
            m.apply(v, x)
        assert set(scales) == set(replaced)
        assert all(s > 0 for s in scales.values())

    def test_static_scales_track_dynamic_on_calibration_batch(self):
        """Static quantization with scales calibrated on the same batch
        stays close to the dynamic path (not bit-equal: calibration
        observes FLOAT activations, while dynamic layers see the
        quantized previous layer's outputs) and close to fp32."""
        from neighbour_feature_pooling_tpu.quant import (
            calibrate_act_scales, quantized_apply)

        x = jnp.asarray(np.random.default_rng(6)
                        .standard_normal((2, 8, 8, 64)), jnp.float32)
        m = _GemmRouteModel()
        v = m.init(jax.random.PRNGKey(0), x)
        base = QuantConfig(min_contraction=1, use_mxu_gemm=False)
        scales = calibrate_act_scales(m, v, [x], config=base,
                                      apply_kwargs={})
        ref = np.asarray(m.apply(v, x))
        dyn = np.asarray(quantized_apply(m, v, x, config=base))
        stat = np.asarray(quantized_apply(
            m, v, x, config=QuantConfig(min_contraction=1,
                                        use_mxu_gemm=False,
                                        act_scales=scales)))
        for got in (dyn, stat):
            rel = (np.linalg.norm(got - ref) / np.linalg.norm(ref))
            assert rel < 0.05, rel
        rel_ds = (np.linalg.norm(dyn - stat) / np.linalg.norm(ref))
        assert rel_ds < 0.05, rel_ds

    def test_calibration_max_reduces_over_batches(self):
        from neighbour_feature_pooling_tpu.quant import calibrate_act_scales

        rng = np.random.default_rng(7)
        small = jnp.asarray(rng.standard_normal((1, 8, 8, 64)) * 0.1,
                            jnp.float32)
        big = jnp.asarray(rng.standard_normal((1, 8, 8, 64)) * 3.0,
                          jnp.float32)
        m = _GemmRouteModel()
        v = m.init(jax.random.PRNGKey(0), small)
        cfg = QuantConfig(min_contraction=1, use_mxu_gemm=False)
        s_both = calibrate_act_scales(m, v, [small, big], config=cfg,
                                      apply_kwargs={})
        s_big = calibrate_act_scales(m, v, [big], config=cfg,
                                     apply_kwargs={})
        assert s_both == s_big

    def test_vit_proj_calibration(self):
        from neighbour_feature_pooling_tpu.models import get_model
        from neighbour_feature_pooling_tpu.quant import calibrate_act_scales

        model = get_model("vittiny", "gap_only", 3)
        x = jnp.asarray(np.random.default_rng(8)
                        .standard_normal((1, 32, 32, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        scales = calibrate_act_scales(model, v, [x])
        qkv = [k for k in scales if k[-1] == "proj_qkv"]
        out = [k for k in scales if k[-1] == "proj_out"]
        assert len(qkv) == 12 and len(out) == 12

    def test_predictor_calibrate(self):
        from neighbour_feature_pooling_tpu.serve import Predictor

        pred = Predictor("resnet18", "gap_only", num_classes=3,
                         batch_size=4, input_size=32, resize_size=36,
                         quantize="int8")
        rng = np.random.default_rng(2)
        imgs = [rng.random((36, 36, 3)).astype(np.float32)
                for _ in range(6)]
        before = pred.predict(imgs)
        n = pred.calibrate(imgs)
        assert n >= 15
        after = pred.predict(imgs)
        assert after["probabilities"].shape == before["probabilities"].shape
        assert np.mean(np.abs(after["probabilities"]
                              - before["probabilities"])) < 0.05

    def test_predictor_calibrate_requires_int8(self):
        from neighbour_feature_pooling_tpu.serve import Predictor

        pred = Predictor("resnet18", "gap_only", num_classes=3,
                         batch_size=2, input_size=32, resize_size=36)
        with pytest.raises(ValueError):
            pred.calibrate([np.zeros((36, 36, 3), np.float32)])


class TestBNFolding:
    def _setup_resnet(self):
        from neighbour_feature_pooling_tpu.models import get_model

        model = get_model("resnet18", "gap_only", 3)
        x = jnp.asarray(np.random.default_rng(9)
                        .standard_normal((2, 32, 32, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        return model, v, x

    def test_pairs_discovered_on_resnet18(self):
        from neighbour_feature_pooling_tpu.quant import build_bn_folding

        model, v, x = self._setup_resnet()
        folding = build_bn_folding(model, v, x)
        # every eligible conv in the resnet18 body is conv->BN
        assert len(folding["convs"]) >= 15
        assert len(folding["bns"]) == len(folding["convs"])
        mult, shift = next(iter(folding["convs"].values()))
        assert mult.shape == shift.shape and mult.ndim == 1

    def test_folded_matches_unfolded_quantized(self):
        """Folding the BN affine into the conv epilogue == running the BN
        after the quantized conv (same math, reassociated)."""
        from neighbour_feature_pooling_tpu.quant import (
            build_bn_folding, quantized_apply)

        model, v, x = self._setup_resnet()
        base = QuantConfig(use_mxu_gemm=False)
        folding = build_bn_folding(model, v, x, config=base)
        plain = np.asarray(quantized_apply(model, v, x, train=False,
                                           config=base))
        folded = np.asarray(quantized_apply(
            model, v, x, train=False,
            config=QuantConfig(use_mxu_gemm=False, bn_folding=folding)))
        np.testing.assert_allclose(folded, plain, rtol=2e-4, atol=2e-5)

    def test_folded_mxu_route_matches_xla_route(self):
        from neighbour_feature_pooling_tpu.quant import (
            build_bn_folding, quantized_apply)

        model, v, x = self._setup_resnet()
        folding = build_bn_folding(model, v, x)
        outs = {}
        for mxu in (False, True):
            cfg = QuantConfig(use_mxu_gemm=mxu, bn_folding=folding)
            outs[mxu] = np.asarray(quantized_apply(model, v, x,
                                                   train=False,
                                                   config=cfg))
        np.testing.assert_array_equal(outs[True], outs[False])

    def test_folding_refuses_training_mode(self):
        from neighbour_feature_pooling_tpu.quant import (
            build_bn_folding, quantized_apply)

        model, v, x = self._setup_resnet()
        folding = build_bn_folding(model, v, x)
        cfg = QuantConfig(use_mxu_gemm=False, bn_folding=folding)
        with pytest.raises(ValueError, match="inference-only"):
            quantized_apply(model, v, x, train=True, config=cfg,
                            rngs={"dropout": jax.random.PRNGKey(0)},
                            mutable=["batch_stats"])

    @pytest.mark.parametrize("mtype,n_pairs", [
        ("resnet50", 53),      # every eligible conv is conv->BN
        ("mobilenetv3", 23),   # SE squeeze/excite convs have no BN
    ])
    def test_folding_coverage(self, mtype, n_pairs):
        from neighbour_feature_pooling_tpu.models import get_model
        from neighbour_feature_pooling_tpu.quant import build_bn_folding

        model = get_model(mtype, "gap_only", 3)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        folding = build_bn_folding(model, v, x)
        assert len(folding["convs"]) == n_pairs

    def test_calibrated_predictor_exports(self, tmp_path):
        """AOT export freezes the calibrated program: static scales are
        constants in the artifact and the reload matches exactly."""
        from neighbour_feature_pooling_tpu.serve import (
            Predictor, export_predictor, load_exported)

        pred = Predictor("resnet18", "gap_only", num_classes=3,
                         batch_size=4, input_size=32, resize_size=36,
                         quantize="int8")
        rng = np.random.default_rng(3)
        imgs = [rng.random((36, 36, 3)).astype(np.float32)
                for _ in range(4)]
        pred.calibrate(imgs)
        want = pred.predict(imgs)
        path = str(tmp_path / "artifact_int8_calib")
        export_predictor(pred, path)
        got = load_exported(path).predict(imgs)
        np.testing.assert_allclose(got["probabilities"],
                                   want["probabilities"], atol=1e-5)

    def test_folding_requires_dataflow_not_adjacency(self):
        """A BN that is called right after a conv but does NOT consume
        its output must not fold."""
        from neighbour_feature_pooling_tpu.quant import build_bn_folding

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = nn.Conv(8, (3, 3), padding=1, use_bias=False,
                            name="conv")(x)
                y = nn.relu(y)  # value between conv and BN
                y = nn.BatchNorm(use_running_average=True,
                                 name="bn")(y)
                return y

        x = jnp.zeros((1, 8, 8, 8), jnp.float32)
        m = M()
        v = m.init(jax.random.PRNGKey(0), x)
        folding = build_bn_folding(m, v, x,
                                   config=QuantConfig(min_contraction=1),
                                   apply_kwargs={})
        assert folding["convs"] == {} and folding["bns"] == set()


class TestInt8Chains:
    def _setup(self):
        from neighbour_feature_pooling_tpu.models import get_model
        from neighbour_feature_pooling_tpu.quant import (
            build_bn_folding, build_int8_chains, calibrate_act_scales)

        model = get_model("resnet18", "gap_only", 3)
        x = jnp.asarray(np.random.default_rng(11)
                        .standard_normal((2, 32, 32, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        base = QuantConfig(use_mxu_gemm=False)
        folding = build_bn_folding(model, v, x, config=base)
        cfg_fold = QuantConfig(use_mxu_gemm=False, bn_folding=folding)
        scales = calibrate_act_scales(model, v, [x], config=cfg_fold)
        chains = build_int8_chains(model, v, x, scales, config=cfg_fold)
        return model, v, x, folding, scales, chains

    def test_chains_discovered_on_resnet18(self):
        model, v, x, folding, scales, chains = self._setup()
        # conv1 -> bn1 -> relu -> conv2 inside each of the 8 basic
        # blocks is the chainable pattern; block outputs (adds) are not
        assert len(chains) == 8, sorted(chains)
        assert all(relu for relu, _ in chains.values())
        assert all(k[-1] == "conv1" for k in chains)

    def test_chained_close_to_unchained(self):
        from neighbour_feature_pooling_tpu.quant import quantized_apply

        model, v, x, folding, scales, chains = self._setup()
        assert chains, "verification must not have discarded the chains"
        base = QuantConfig(use_mxu_gemm=False, bn_folding=folding,
                           act_scales=scales)
        cfg = QuantConfig(use_mxu_gemm=False, bn_folding=folding,
                          act_scales=scales, int8_chains=chains)
        ref = np.asarray(quantized_apply(model, v, x, train=False,
                                         config=base))
        got = np.asarray(quantized_apply(model, v, x, train=False,
                                         config=cfg))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel

    def test_chained_mxu_route_bit_identical(self):
        from neighbour_feature_pooling_tpu.quant import quantized_apply

        model, v, x, folding, scales, chains = self._setup()
        outs = {}
        for mxu in (False, True):
            cfg = QuantConfig(use_mxu_gemm=mxu, bn_folding=folding,
                              act_scales=scales, int8_chains=chains)
            outs[mxu] = np.asarray(quantized_apply(model, v, x,
                                                   train=False,
                                                   config=cfg))
        np.testing.assert_array_equal(outs[True], outs[False])

    @pytest.mark.parametrize("mtype,n_chains", [
        ("resnet50", 32),     # conv1->conv2->conv3 in all 16 bottlenecks
        ("mobilenetv3", 0),   # false chains (multi-consumer linear conv
        #                       feeding the residual add) MUST be caught
        #                       by the end-to-end guard and discarded
    ])
    def test_chain_coverage(self, mtype, n_chains):
        import warnings

        from neighbour_feature_pooling_tpu.models import get_model
        from neighbour_feature_pooling_tpu.quant import (
            build_bn_folding, build_int8_chains, calibrate_act_scales)

        model = get_model(mtype, "gap_only", 3)
        x = jnp.asarray(np.random.default_rng(12)
                        .standard_normal((1, 64, 64, 3)), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        folding = build_bn_folding(model, v, x)
        cfg = QuantConfig(use_mxu_gemm=False, bn_folding=folding)
        scales = calibrate_act_scales(model, v, [x], config=cfg)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            chains = build_int8_chains(model, v, x, scales, config=cfg)
        assert len(chains) == n_chains
