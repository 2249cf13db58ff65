"""Post-training int8 quantization for serving.

The reference has no quantized-inference story (its serving surface stops
at ``trainer.test``, ``/root/reference/demo.py:427``). Measured v5e
routing facts (PARITY.md "int8 MXU kernels — measured", 2026-08-18):
XLA's s8 ``dot_general`` runs at 1.04× its bf16 twin, its s8 *conv*
lowering at 0.73×, and the in-tree Pallas int8 kernels at 0.55–0.87×
(opt-in only). This module is built around those numbers: every
GEMM-shaped contraction (dense, 1×1 convs via subsample-then-GEMM, the
ViT attention projections) lowers as s8 ``dot_general``; spatial convs
use XLA's s8 conv — or stay in the float dtype under the **mixed tier**
(``quantize_spatial=False``). With static calibration + BN folding +
verified s8 chaining + weight pre-quantization, the best int8 tier per
family measured at-or-above bf16 (RN18 1.01×, RN50-mixed 1.07×, ViT
1.04×, MNv3 1.17×) at ¼ the weight bytes; bf16 remains the simple
default recommendation.

Design — dynamic-activation / static-weight symmetric int8:

- **Weights**: per-output-channel symmetric scales (``amax/127`` over the
  contraction axes), computed inside the jitted forward from the fp32
  params. The extra pass over the weights is one read of ~11–25 M values
  per batch — noise next to the activation traffic it saves.
- **Activations**: per-tensor dynamic symmetric scale computed on device
  per call (no calibration set needed; nothing saturates because the
  scale is the batch's own amax).
- **Accumulation**: ``s8 × s8 → s32`` via ``preferred_element_type`` so
  XLA lowers straight onto the MXU's int8 mode; dequantized with the
  product of the two scales, bias added in fp32.

Coverage is mechanical, not per-model: a ``flax.linen.intercept_methods``
interceptor replaces every eligible ``nn.Conv``/``nn.Dense`` call in any
model in the zoo — no model rewrites, identical parameter trees, works for
ported timm checkpoints. Ineligible (kept fp32): grouped/depthwise convs
(no MXU contraction to win back), layers whose contraction is below
``min_contraction`` (scale/zero-point overhead dominates), the final
classifier (``fc``, standard PTQ practice), and the texture pooling ops
(NFP/lacunarity/fractal), which stay in their fp32/bf16 forms. The ViT
fused-QKV and output projections quantize through the interceptable
``FusedAttention.proj`` method; only QKᵀ and softmax·V stay float.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

import flax.linen as nn

from .ops.int8_conv import int8_conv2d
from .ops.int8_gemm import int8_gemm

__all__ = ["QuantConfig", "build_bn_folding", "build_int8_chains",
           "calibrate_act_scales", "make_int8_interceptor",
           "prequantize_weights", "quantized_apply", "strip_prequantized"]


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Eligibility policy for int8 layer replacement.

    ``min_contraction``: smallest fan-in (``kh·kw·c_in`` for convs,
    ``in_features`` for dense) worth quantizing — below it the op is
    bandwidth/overhead-bound and int8 only adds rounding error.
    ``skip_paths``: module-path components kept fp32 (default: the
    classifier head).
    ``use_mxu_gemm``: route dense layers, 1×1 convs and spatial convs
    through the Pallas int8 kernels (``ops/int8_gemm.py`` /
    ``ops/int8_conv.py``). ``None`` = auto, currently **off
    everywhere**: the 2026-08-18 v5e session measured the Pallas route
    at 0.79–0.86× XLA bf16 (GEMM 82.8 vs 104.6 TOPS at 4096³) and
    0.55–0.87× on the ResNet conv shapes, and end-to-end serving fell
    to 6.3k img/s vs 22.3k on the plain XLA s8 route (PARITY.md "int8
    MXU kernels — measured"). The kernels stay available (bit-exact,
    tile-tunable) for hardware where Mosaic's int8 mode wins.
    ``act_scales``: static activation scales from
    :func:`calibrate_act_scales` (``{layer_key: float}``); layers found
    in the dict skip the dynamic per-batch amax pass.
    ``bn_folding``: inference BN folding map from
    :func:`build_bn_folding`; paired convs absorb the BN affine into
    their dequant epilogue and the BN itself becomes identity — one
    whole elementwise HBM pass per conv removed.
    ``int8_chains``: conv→conv chain map from :func:`build_int8_chains`
    (requires ``act_scales``): producer convs requantize inside the
    epilogue (with fused ReLU) and emit s8 directly — the chained
    activation never exists in float in HBM (¼ the write traffic, and
    the consumer's quantize pass disappears).
    """

    min_contraction: int = 64
    skip_paths: Tuple[str, ...] = ("fc",)
    use_mxu_gemm: Optional[bool] = None
    act_scales: Optional[dict] = None
    bn_folding: Optional[dict] = None
    int8_chains: Optional[dict] = None
    # mixed tier: quantize only the GEMM-shaped layers (dense, attention
    # projections, 1×1 convs — all on the 1.04×-bf16 s8 dot_general
    # lowering) and leave spatial convs in the float dtype. On v5e this
    # sidesteps XLA's 0.73× s8 *conv* lowering that keeps full-int8
    # ResNet50 at 0.81× bf16 (PARITY.md "int8 MXU kernels — measured").
    quantize_spatial: bool = True

    def _mxu(self) -> bool:
        if self.use_mxu_gemm is None:
            return False  # measured slower than XLA on v5e; see docstring
        return self.use_mxu_gemm


def _canon_tuple(v, n: int) -> Tuple[int, ...]:
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(int(e) for e in v)


def _canon_padding(p, n: int):
    """flax Conv padding spec → lax.conv_general_dilated padding arg."""
    if isinstance(p, str):
        return p
    if isinstance(p, int):
        return [(p, p)] * n
    out = []
    for e in p:
        out.append((int(e), int(e)) if isinstance(e, int)
                   else (int(e[0]), int(e[1])))
    return out


def _quantize(x: jax.Array, axes: Optional[Tuple[int, ...]] = None,
              ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization.

    ``axes=None``: one per-tensor scale. Otherwise the scale reduces over
    ``axes`` (keepdims) — per-output-channel when ``axes`` are the
    contraction dims. Returns ``(q_int8, scale_f32)`` with
    ``x ≈ q * scale``.
    """
    x = x.astype(jnp.float32)
    amax = (jnp.max(jnp.abs(x)) if axes is None
            else jnp.max(jnp.abs(x), axis=axes, keepdims=True))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _quantize_act(x: jax.Array, act_scale: Optional[float],
                  ) -> Tuple[jax.Array, jax.Array]:
    """Activation quantization: dynamic per-tensor amax, or a fixed
    calibrated scale (skips the amax pass; saturating clip handles
    out-of-calibration values). An int8 input is already quantized by a
    chained producer (``int8_chains``) — passed through with its
    calibrated scale."""
    if x.dtype == jnp.int8:
        if act_scale is None:
            raise ValueError(
                "int8 activation input requires a calibrated act_scale "
                "(chained producers quantize with the consumer's scale)")
        return x, jnp.asarray(act_scale, jnp.float32)
    if act_scale is None:
        return _quantize(x)
    s = jnp.asarray(act_scale, jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                 -127.0, 127.0).astype(jnp.int8)
    return q, s


def prequantize_weights(variables, config: Optional[QuantConfig] = None):
    """Quantize every candidate kernel ONCE, outside the serving loop.

    Walks ``variables["params"]`` and emits an ``"int8w"`` collection
    mirroring the param tree: each 2-D (Dense) or 4-D (Conv) ``kernel``
    whose contraction is ≥ ``min_contraction`` (and not under a skip
    path) gets ``{"wq": int8, "ws": f32}`` — the same per-output-channel
    symmetric quantization the interceptor would compute in the jitted
    forward. Layers the interceptor finds ineligible at trace time
    (grouped convs, dilation, circular padding …) simply never read
    their entry.

    Merge the result into the apply variables
    (``{**variables, "int8w": prequantize_weights(variables)}``):
    quantized layers then skip the per-call weight read + amax/round
    pass (one full sweep of the ~11–25 M weight values per batch) and
    use the prebaked s8 tensors. Same ``_quantize`` on the same values —
    bit-identical to the dynamic path up to 1-ulp scale differences from
    XLA reassociating the in-jit amax reductions.
    """
    cfg = config or QuantConfig()

    def walk(tree):
        out = {}
        for name, v in tree.items():
            if name in cfg.skip_paths:
                continue
            if isinstance(v, dict) or hasattr(v, "items"):
                sub = walk(v)
                if sub:
                    out[name] = sub
            elif (name == "kernel" and hasattr(v, "ndim")
                  and v.ndim in (2, 4)):
                if (not cfg.quantize_spatial and v.ndim == 4
                        and any(k != 1 for k in v.shape[:-2])):
                    continue  # mixed tier: spatial kernels stay float
                contraction = 1
                for d in v.shape[:-1]:
                    contraction *= d
                if contraction < cfg.min_contraction:
                    continue
                wq, ws = _quantize(v, axes=tuple(range(v.ndim - 1)))
                out["wq"], out["ws"] = wq, ws
        return out

    # one jitted sweep: the eager walk would dispatch ~7 ops per kernel,
    # each paying a relay round trip (cf. the jitted _collect in
    # calibrate_act_scales, same reasoning)
    return jax.jit(walk)(variables.get("params", {}))


def strip_prequantized(variables, replaced):
    """Serving variables without the dead fp32 kernels.

    ``replaced`` — the module paths a trace of the quantized program
    actually replaced (``make_int8_interceptor(replaced=[...])``). For
    each such Conv/Dense whose ``"int8w"`` entry is baked
    (:func:`prequantize_weights`), the quantized forward reads only
    ``wq``/``ws`` — its fp32 ``kernel`` is a dead jit input that would
    still be transferred, replicated under data-parallel serving, and
    serialized into AOT export artifacts (5× the weight bytes actually
    needed). Returns a new variables dict with those kernels dropped;
    everything else (biases, BN stats, ineligible layers, the attention
    projections — which quantize in-line from the module's own fp32
    weights) is kept. The full tree remains necessary for calibration
    (the observe pass runs the float model) — keep it host-side.
    """
    int8w = variables.get("int8w")
    if not int8w:
        return variables
    # conv/dense keys are plain module paths; attention-proj keys carry a
    # synthetic "proj_*" tail and never correspond to a baked entry
    strip = set()
    for key in replaced:
        node = int8w
        for comp in key:
            node = node.get(comp) if isinstance(node, dict) else None
            if node is None:
                break
        if isinstance(node, dict) and "wq" in node:
            strip.add(tuple(key))

    def walk(tree, path):
        out = {}
        for name, v in tree.items():
            if isinstance(v, dict) or hasattr(v, "items"):
                out[name] = walk(v, path + (name,))
            elif not (name == "kernel" and path in strip):
                out[name] = v
        return out

    return {**variables, "params": walk(variables.get("params", {}), ())}


def _weights_int8(mod, kshape, param_dtype) -> Tuple[jax.Array, jax.Array]:
    """Fetch the layer's quantized weights: the prebaked ``"int8w"``
    entry when present (see :func:`prequantize_weights`), else quantize
    the fp32 kernel param in-line (dynamic path, one weight sweep per
    call)."""
    wq = mod.get_variable("int8w", "wq", None)
    if wq is not None and wq.shape == kshape:
        return wq, mod.get_variable("int8w", "ws")
    kernel = mod.param("kernel", mod.kernel_init, kshape, param_dtype)
    return _quantize(kernel, axes=tuple(range(kernel.ndim - 1)))


def _conv_eligible(mod: nn.Conv, x: jax.Array, cfg: QuantConfig) -> bool:
    if mod.feature_group_count != 1:
        return False  # depthwise/grouped: no dense contraction to speed up
    if getattr(mod, "mask", None) is not None:
        return False
    nd = x.ndim - 2
    if any(d != 1 for d in _canon_tuple(getattr(mod, "kernel_dilation", 1),
                                        nd)):
        return False
    if any(d != 1 for d in _canon_tuple(getattr(mod, "input_dilation", 1),
                                        nd)):
        return False
    pad = mod.padding
    if isinstance(pad, str) and pad.upper() in ("CIRCULAR", "REFLECT"):
        return False
    ksize = _canon_tuple(mod.kernel_size, nd)
    if not cfg.quantize_spatial and any(k != 1 for k in ksize):
        return False  # mixed tier: spatial convs stay float
    contraction = x.shape[-1]
    for k in ksize:
        contraction *= k
    return contraction >= cfg.min_contraction


def _is_zero_padding(pad, ksize) -> bool:
    """True when the padding spec adds no border pixels (for 1×1 convs
    ``SAME`` == ``VALID`` == zero border, so GEMM lowering is exact)."""
    if isinstance(pad, str):
        if pad.upper() == "VALID":
            return True
        # SAME / SAME_LOWER pad (k-1) total per dim — zero iff k == 1
        return all(k == 1 for k in ksize)
    canon = _canon_padding(pad, len(ksize))
    return all(lo == 0 and hi == 0 for lo, hi in canon)


def _conv_int8(mod: nn.Conv, x: jax.Array,
               cfg: Optional[QuantConfig] = None,
               act_scale: Optional[float] = None,
               fold: Optional[Tuple[jax.Array, jax.Array]] = None,
               chain: Optional[Tuple[bool, float]] = None,
               ) -> jax.Array:
    """int8 replacement for an eligible ``nn.Conv.__call__``.

    Declares the same ``kernel``/``bias`` params (names, shapes, inits) as
    flax so the variable tree is indistinguishable from the fp32 model.
    1×1 convs (the majority of ResNet50/MobileNetV3 contraction FLOPs)
    lower as subsample-then-GEMM (exact for a 1×1 kernel under any
    stride): s8 ``dot_general`` on the default route (measured 1.04×
    bf16 on v5e, vs 0.73× for XLA's s8 conv), or the opt-in Pallas
    int8 GEMM when ``cfg._mxu()`` (measured 0.79–0.86× bf16 — see the
    ``QuantConfig`` docstring and PARITY.md "int8 MXU kernels —
    measured").
    """
    cfg = cfg or QuantConfig()
    nd = x.ndim - 2
    ksize = _canon_tuple(mod.kernel_size, nd)
    in_features = x.shape[-1]
    kshape = ksize + (in_features, mod.features)
    bias = (mod.param("bias", mod.bias_init, (mod.features,),
                      mod.param_dtype)
            if mod.use_bias else None)

    wq, ws = _weights_int8(mod, kshape, mod.param_dtype)
    xq, xs = _quantize_act(x, act_scale)
    strides = _canon_tuple(mod.strides, nd)

    # dequant epilogue affine: y = acc·scale_vec + bias_vec.  A folded
    # BatchNorm (build_bn_folding) rides in here — with per-channel
    # weight scales, folding into the epilogue is numerically equivalent
    # to folding into the weights, and the BN's HBM pass disappears.
    scale_vec = (xs * ws).reshape(-1)
    bias_vec = None if bias is None else bias.astype(jnp.float32)
    if fold is not None:
        mult, shift = fold
        scale_vec = scale_vec * mult
        bias_vec = shift if bias_vec is None else bias_vec * mult + shift

    # chained producer: fold the consumer's activation scale into the
    # epilogue affine and emit requantized s8 (with the intervening ReLU
    # fused) — the activation never exists in float in HBM
    relu_flag = False
    # an s8 input means OUR producer chained to us; we still emit float
    # (unless we chain onward ourselves)
    out_dt = x.dtype if x.dtype != jnp.int8 else (mod.dtype
                                                  or jnp.float32)
    if chain is not None:
        relu_flag, cons_scale = chain
        cs = jnp.asarray(cons_scale, jnp.float32)
        scale_vec = scale_vec / cs
        bias_vec = None if bias_vec is None else bias_vec / cs
        out_dt = jnp.int8

    if all(k == 1 for k in ksize) and _is_zero_padding(mod.padding, ksize):
        # 1×1, zero border: subsample-then-GEMM is exact under any
        # stride. Pallas int8 GEMM when opted in, else XLA s8
        # dot_general (measured 1.04× bf16 on v5e vs 0.73× for XLA's
        # s8 conv — PARITY.md "int8 MXU kernels — measured").
        sub = (slice(None),) + tuple(slice(None, None, s) for s in strides)
        xsub = xq[sub]
        rows = xsub.reshape(-1, in_features)
        wmat = wq.reshape(in_features, mod.features)
        if cfg._mxu():
            y = int8_gemm(rows, wmat, scale=scale_vec, bias=bias_vec,
                          out_dtype=out_dt, relu=relu_flag)
            return y.reshape(xsub.shape[:-1] + (mod.features,))
        acc = lax.dot_general(rows, wmat, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        acc = acc.reshape(xsub.shape[:-1] + (mod.features,))
    elif (cfg._mxu() and nd == 2
          and in_features * strides[0] * strides[1] >= 32):
        # thin-channel layers (the RGB stem even after the s2d stride
        # rewrite) would waste MXU lanes — those keep the XLA conv.
        # Dequant + bias fuse into the kernel flush: the s32 accumulator
        # never reaches HBM.
        pad = (mod.padding if isinstance(mod.padding, str)
               else _canon_padding(mod.padding, nd))
        return int8_conv2d(
            xq, wq, padding=pad, strides=strides,
            scale=scale_vec, bias=bias_vec,
            out_dtype=out_dt, relu=relu_flag)
    else:
        dn = lax.conv_dimension_numbers(x.shape, kshape,
                                        ("NHWC", "HWIO", "NHWC"))
        acc = lax.conv_general_dilated(
            xq, wq,
            window_strides=strides,
            padding=_canon_padding(mod.padding, nd),
            dimension_numbers=dn,
            preferred_element_type=jnp.int32)
    # XLA fallback: same epilogue op order as the fused kernels (mul,
    # add, relu, round/clip, cast) so routes stay bit-identical
    y = acc.astype(jnp.float32) * scale_vec
    if bias_vec is not None:
        y = y + bias_vec
    if relu_flag:
        y = jnp.maximum(y, 0.0)
    if out_dt == jnp.int8:
        y = jnp.clip(jnp.round(y), -127.0, 127.0)
    return y.astype(out_dt)


def _dense_int8(mod: nn.Dense, x: jax.Array,
                cfg: Optional[QuantConfig] = None,
                act_scale: Optional[float] = None) -> jax.Array:
    cfg = cfg or QuantConfig()
    in_features = x.shape[-1]
    bias = (mod.param("bias", mod.bias_init, (mod.features,),
                      mod.param_dtype)
            if mod.use_bias else None)
    wq, ws = _weights_int8(mod, (in_features, mod.features),
                           mod.param_dtype)
    xq, xs = _quantize_act(x, act_scale)
    if cfg._mxu():
        y = int8_gemm(xq.reshape(-1, in_features), wq,
                      scale=(xs * ws).reshape(-1), bias=bias,
                      out_dtype=x.dtype)
        return y.reshape(x.shape[:-1] + (mod.features,))
    acc = lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (xs * ws.reshape(-1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _attn_proj_int8(mod, x: jax.Array, w: jax.Array, b: jax.Array,
                    cfg: QuantConfig,
                    act_scale: Optional[float] = None) -> jax.Array:
    """int8 twin of ``FusedAttention.proj`` (QKV-fused / output matmul).

    Per-output-column weight scales, per-tensor dynamic activation scale,
    exact s32 accumulation; the attention body (QKᵀ, softmax·V) stays in
    the float dtype for accuracy.
    """
    wq, ws = _quantize(w, axes=(0,))
    xq, xs = _quantize_act(x, act_scale)
    if cfg._mxu():
        y = int8_gemm(xq.reshape(-1, x.shape[-1]), wq,
                      scale=(xs * ws).reshape(-1), bias=b,
                      out_dtype=mod.dtype)
        return y.reshape(x.shape[:-1] + (w.shape[-1],))
    acc = lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (xs * ws.reshape(-1))
    y = y + b.astype(jnp.float32)
    return y.astype(mod.dtype)


def make_int8_interceptor(config: Optional[QuantConfig] = None,
                          replaced: Optional[list] = None,
                          observe: Optional[dict] = None):
    """Build an interceptor for ``nn.intercept_methods``.

    ``replaced``, when given, collects the module path of every call the
    interceptor actually quantized (trace-time; useful for tests and
    coverage reports). ``observe``, when given, turns the interceptor
    into a calibration observer: instead of quantizing, it records each
    eligible call's activation ``max|x|`` into the dict (keyed like
    ``QuantConfig.act_scales``) and runs the layer in float — the
    mechanism behind :func:`calibrate_act_scales`.
    """
    from .models.backbones.vit import FusedAttention

    cfg = config or QuantConfig()
    scales = cfg.act_scales or {}
    folding = cfg.bn_folding

    def _skipped(mod) -> bool:
        path = getattr(mod, "path", ()) or ()
        return any(comp in cfg.skip_paths for comp in path)

    def _hit(key, next_fun, args, kwargs, quantized):
        if observe is not None:
            amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
            observe[key] = (jnp.maximum(observe[key], amax)
                            if key in observe else amax)
            return next_fun(*args, **kwargs)
        if replaced is not None:
            replaced.append(key)
        return quantized(scales.get(key))

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (type(mod) is FusedAttention and context.method_name == "proj"
                and len(args) == 3 and not _skipped(mod)
                and args[0].shape[-1] >= cfg.min_contraction):
            key = tuple(mod.path) + (f"proj_{kwargs.get('tag', 'qkv')}",)
            return _hit(key, next_fun, args, kwargs,
                        lambda s: _attn_proj_int8(mod, *args, cfg=cfg,
                                                  act_scale=s))
        if (context.method_name != "__call__" or not args
                or not isinstance(args[0], jax.Array) or _skipped(mod)):
            return next_fun(*args, **kwargs)
        x = args[0]
        if (type(mod) is nn.BatchNorm and folding and observe is None
                and tuple(mod.path) in folding.get("bns", ())):
            # (in observe/calibration mode the float graph keeps its BN —
            # the observed conv inputs then match the folded graph's)
            if mod.use_running_average is not True:
                raise ValueError(
                    "BN folding is inference-only: BatchNorm at "
                    f"{mod.path} is not in use_running_average mode")
            return x  # affine absorbed by the preceding conv's epilogue
        if (type(mod) is nn.Conv and x.ndim >= 3
                and _conv_eligible(mod, x, cfg)):
            key = tuple(mod.path)
            fold = (folding or {}).get("convs", {}).get(key)
            chain = (cfg.int8_chains or {}).get(key)
            return _hit(key, next_fun, args, kwargs,
                        lambda s: _conv_int8(mod, x, cfg, act_scale=s,
                                             fold=fold, chain=chain))
        if (type(mod) is nn.Dense and x.ndim >= 1
                and x.shape[-1] >= cfg.min_contraction):
            return _hit(tuple(mod.path), next_fun, args, kwargs,
                        lambda s: _dense_int8(mod, x, cfg, act_scale=s))
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate_act_scales(model: nn.Module, variables,
                         batches: Sequence[jax.Array],
                         config: Optional[QuantConfig] = None,
                         apply_kwargs: Optional[dict] = None) -> dict:
    """Static activation calibration for the int8 tier.

    Runs the float model over ``batches`` with an observing interceptor
    and returns ``{layer_key: scale}`` (symmetric ``max|x|/127`` over all
    batches) for every layer the quantizer would replace. Feed the result
    to ``QuantConfig(act_scales=...)``: each quantized layer then uses its
    fixed scale instead of computing a dynamic per-batch amax — removing
    a full extra HBM read of every activation tensor per forward, and
    making the quantized program's numerics input-independent (AOT
    artifacts hash identically across serving batches).

    Mirrors standard PTQ calibration (TensorRT/ONNXRuntime style); the
    reference has no quantization story at all
    (``/root/reference/demo.py:427`` stops at ``trainer.test``).
    """
    cfg = config or QuantConfig()
    if apply_kwargs is None:
        apply_kwargs = {"train": False}   # the zoo convention; pass {}
        #                                   for models without the kwarg

    @jax.jit
    def _observe(v, x):
        sink: dict = {}
        with nn.intercept_methods(
                make_int8_interceptor(cfg, observe=sink)):
            model.apply(v, x, **apply_kwargs)
        return sink

    amaxes: dict = {}
    for batch in batches:
        out = jax.device_get(_observe(variables, jnp.asarray(batch)))
        for k, v in out.items():
            amaxes[k] = max(amaxes.get(k, 0.0), float(v))
    return {k: max(v, 1e-12) / 127.0 for k, v in amaxes.items()}


def build_bn_folding(model: nn.Module, variables, sample: jax.Array,
                     config: Optional[QuantConfig] = None,
                     apply_kwargs: Optional[dict] = None) -> dict:
    """Discover ``Conv → BatchNorm`` pairs and extract folded affines.

    Runs one abstract trace (``jax.eval_shape`` — no compute) recording
    the call order of quantizer-eligible convs and ``nn.BatchNorm``s; a
    BN immediately following a conv with matching features is folded:
    with ``f = γ/√(running_var+ε)`` the conv's dequant epilogue becomes
    ``acc·(scale·f) + (bias·f + β − mean·f)`` and the BN call turns into
    identity — deleting one full elementwise HBM pass per conv at
    inference. Classic deployment-graph folding (TensorRT-style); the
    reference serves raw training graphs (``/root/reference/demo.py:427``).

    Returns ``{"convs": {conv_key: (mult, shift)}, "bns": {bn_path, …}}``
    for ``QuantConfig(bn_folding=...)``.
    """
    cfg = config or QuantConfig()
    if apply_kwargs is None:
        apply_kwargs = {"train": False}

    events = []

    def _skipped(mod) -> bool:
        path = getattr(mod, "path", ()) or ()
        return any(comp in cfg.skip_paths for comp in path)

    def observer(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__" and args
                and hasattr(args[0], "ndim")):
            if (type(mod) is nn.Conv and args[0].ndim >= 3
                    and not _skipped(mod)
                    and _conv_eligible(mod, args[0], cfg)):
                out = next_fun(*args, **kwargs)
                # keep the traced output VALUE: a BN folds only if its
                # input IS this value (dataflow, not call adjacency)
                events.append(("conv", tuple(mod.path), mod.features,
                               out))
                return out
            if type(mod) is nn.BatchNorm:
                events.append(("bn", tuple(mod.path), mod, args[0]))
        return next_fun(*args, **kwargs)

    def _traced(v, x):
        with nn.intercept_methods(observer):
            return model.apply(v, x, **apply_kwargs)

    jax.eval_shape(_traced, variables, jax.ShapeDtypeStruct(
        sample.shape, sample.dtype))

    def _lookup(tree, path):
        for comp in path:
            if comp not in tree:
                return None
            tree = tree[comp]
        return tree

    convs, bns = {}, set()
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    for prev, ev in zip(events, events[1:]):
        if prev[0] != "conv" or ev[0] != "bn":
            continue
        _, conv_key, features, conv_out = prev
        _, bn_path, bn_mod, bn_in = ev
        if bn_in is not conv_out:
            continue  # something computes between them — not foldable
        bn_params = _lookup(params, bn_path) or {}
        bn_stats = _lookup(stats, bn_path)
        if bn_stats is None or "mean" not in bn_stats:
            continue
        mean = jnp.asarray(bn_stats["mean"], jnp.float32)
        var = jnp.asarray(bn_stats["var"], jnp.float32)
        if mean.shape != (features,):
            continue
        gamma = jnp.asarray(bn_params.get("scale",
                                          jnp.ones((features,))),
                            jnp.float32)
        beta = jnp.asarray(bn_params.get("bias",
                                         jnp.zeros((features,))),
                           jnp.float32)
        f = gamma / jnp.sqrt(var + bn_mod.epsilon)
        convs[conv_key] = (f, beta - mean * f)
        bns.add(bn_path)
    return {"convs": convs, "bns": bns}


def build_int8_chains(model: nn.Module, variables, sample: jax.Array,
                      act_scales: dict,
                      config: Optional[QuantConfig] = None,
                      apply_kwargs: Optional[dict] = None,
                      verify_tol: float = 0.1) -> dict:
    """Discover conv→conv chains where the producer can requantize.

    Runs one concrete float forward recording every eligible conv's
    input/output values; conv A chains to the next eligible conv B when
    B's input *provably equals* ``relu(bn_A(A_out))`` (or ``bn_A(A_out)``)
    elementwise — a dataflow identity, so nothing else computes on (or
    consumes) a different version of that activation path. Chained
    producers then emit saturating-requantized s8 with the ReLU fused
    into the kernel epilogue (``ops/common.py::dequant_epilogue``): the
    activation never exists in float in HBM (¼ the write traffic) and
    the consumer's quantize pass disappears. Any model-code ReLU between
    them becomes a no-op on the already-non-negative s8 values; the
    folded BN is already identity.

    Requires calibrated ``act_scales`` (the producer quantizes with the
    consumer's scale). As a guard against any value-coincidence or
    multi-consumer subtlety, the chained quantized program is verified
    end-to-end against the unchained one on ``sample``; if the relative
    output difference exceeds ``verify_tol`` the chains are discarded
    (returns ``{}``) with a warning. TensorRT-style deployment-graph
    optimization; the reference serves raw training graphs
    (``/root/reference/demo.py:427``).
    """
    import warnings

    cfg = config or QuantConfig()
    folding = (cfg.bn_folding or {}).get("convs", {})
    if apply_kwargs is None:
        apply_kwargs = {"train": False}

    # one row is enough to prove/refute value identity, and it keeps the
    # captured conv activations (all of them, returned from the jit) small
    sample = jnp.asarray(sample)[:1]
    keys = []

    def _collect(v, x):
        keys.clear()   # trace-time: stays correct if jit ever retraces
        vals = []

        def observer(next_fun, args, kwargs, context):
            mod = context.module
            if (context.method_name == "__call__" and args
                    and isinstance(args[0], jax.Array)
                    and type(mod) is nn.Conv and args[0].ndim >= 3
                    and not any(c in cfg.skip_paths
                                for c in (mod.path or ()))
                    and _conv_eligible(mod, args[0], cfg)):
                out = next_fun(*args, **kwargs)
                keys.append(tuple(mod.path))
                vals.append((args[0], out))
                return out
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(observer):
            model.apply(v, x, **apply_kwargs)
        return vals

    # jitted: op-by-op dispatch of a whole backbone through the TPU relay
    # would pay a ~20 ms round trip per op (CLAUDE.md)
    vals = jax.jit(_collect)(variables, sample)
    records = [(k, xv, yv) for k, (xv, yv) in zip(keys, vals)]

    def _matches(a, b):
        return (a.shape == b.shape
                and bool(jnp.allclose(a, b, rtol=1e-4, atol=1e-6)))

    chains = {}
    for (a_key, _, a_out), (b_key, b_in, _) in zip(records, records[1:]):
        if b_key not in act_scales:
            continue
        t = a_out
        fold = folding.get(a_key)
        if fold is not None:
            mult, shift = fold
            t = a_out * mult + shift
        if _matches(b_in, jnp.maximum(t, 0.0)):
            chains[a_key] = (True, float(act_scales[b_key]))
        elif _matches(b_in, t):
            chains[a_key] = (False, float(act_scales[b_key]))
    if not chains:
        return {}

    base = dataclasses.replace(cfg, act_scales=act_scales)
    chained = dataclasses.replace(base, int8_chains=chains)
    ref = jax.jit(lambda v, x: quantized_apply(
        model, v, x, config=base, **apply_kwargs))(variables, sample)
    got = jax.jit(lambda v, x: quantized_apply(
        model, v, x, config=chained, **apply_kwargs))(variables, sample)
    num = float(jnp.linalg.norm((got - ref).astype(jnp.float32)))
    den = max(float(jnp.linalg.norm(ref.astype(jnp.float32))), 1e-12)
    if num / den > verify_tol:
        warnings.warn(
            f"int8 chaining failed end-to-end verification "
            f"(rel diff {num / den:.3f} > {verify_tol}); disabling",
            stacklevel=2)
        return {}
    return chains


def quantized_apply(model: nn.Module, variables, *args,
                    config: Optional[QuantConfig] = None, **kwargs):
    """``model.apply`` with every eligible Conv/Dense running int8."""
    with nn.intercept_methods(make_int8_interceptor(config)):
        return model.apply(variables, *args, **kwargs)
