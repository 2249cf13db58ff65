"""int8 2-D convolution on the MXU — Pallas, no im2col materialization.

History (measured, v5e-1, PARITY.md "int8 MXU kernels — measured"):
built on a Mosaic probe suggesting the MXU's int8 mode ran 1.9× bf16
where XLA's s8 conv lowering manages 0.73×. The hardware session then
failed to reproduce the probe: this kernel measured 0.55–0.87× XLA
bf16 at the four ResNet body shapes, so it is **opt-in**
(``QuantConfig(use_mxu_gemm=True)``; the default int8 route keeps
spatial convs on XLA s8 conv, or in bf16 under the mixed tier). It
remains bit-exact and tile-tunable for hardware where native-int8
outruns bf16.

Formulation — "flattened rows": zero-pad the input spatially, flatten
``(H+Kh-1, W+Kw-1) → Hp·Wp`` rows of ``Cin`` lanes. For a kernel tap
``(dy, dx)`` let ``p = dy·Wp + dx``; its contribution to *every* output
pixel is then one GEMM over a **contiguous row window**::

    acc[o, :] += X_flat[o + p, :] @ W[dy, dx, :, :]      o = i·Wp + j

i.e. ``Kh·Kw`` contiguous-slice GEMMs with the input block resident in
VMEM once — no 9× im2col blow-up in HBM (the thing that makes a
shift-and-GEMM lowering at the XLA level traffic-bound). Output rows are
produced at width ``Wp``; the ``Wo..Wp`` columns are garbage from row
wrap-around and are sliced off on the host. Extra MXU work ≈ ``Wp/Wo``
(+4% at 56², +7% at 28²).

Grid ``(B/TB, Cout/TCout)``: each step owns ``TB`` images packed along
the flattened row axis (so a 7×7×512 map still feeds the MXU thousands
of rows per tap) and one output-channel tile; the taps accumulate in
registers/VMEM as one s32 value. Tap reads that run past an image's
rows land in the next image's region — they only feed that image's
garbage rows (``o ≥ n_out``), which the host discards. Stride > 1
lowers to this unit-stride kernel via an exact space-to-depth rewrite
(phases→channels, taps scattered); dilation 1, groups 1 (everything
else stays on the XLA conv path — ``quant.py`` routes only eligible
layers here).

The reference has no analog (no quantization story at all; its serving
surface stops at ``trainer.test``, ``/root/reference/demo.py:427``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dequant_epilogue as _epilogue
from .common import use_interpret as _use_interpret

__all__ = ["int8_conv2d"]


def _round_up(x: int, m: int) -> int:
    return x + (-x) % m


def _accumulate_taps(x, w_ref, *, kh: int, kw: int, wp: int, n_rows: int):
    """Sum of per-tap GEMMs over contiguous row windows.

    Tap offsets ``p = dy·wp + dx`` are sublane-misaligned in general
    (each slice costs a Mosaic relayout copy of the whole window). When
    ``wp`` is a multiple of the int8 sublane tile (32), factor by ``dx``:
    one misaligned slice per ``dx`` (kw copies), then every ``dy`` offset
    within it is tile-aligned (free) — kh·kw → kw relayouts. The host
    pads ``wp`` up to 32 when that costs ≤ the relayout saving."""
    acc = None
    if wp % 32 == 0:
        for dx in range(kw):
            xs_ = x[dx:dx + (kh - 1) * wp + n_rows, :]
            for dy in range(kh):
                a = xs_[dy * wp:dy * wp + n_rows, :]
                d = jnp.dot(a, w_ref[dy, dx],
                            preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
    else:
        for dy in range(kh):
            for dx in range(kw):
                p = dy * wp + dx
                a = x[p:p + n_rows, :]
                d = jnp.dot(a, w_ref[dy, dx],
                            preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
    return acc


def _conv_kernel(x_ref, w_ref, o_ref, *, kh: int, kw: int, wp: int,
                 n_rows: int):
    o_ref[0] = _accumulate_taps(x_ref[0], w_ref, kh=kh, kw=kw, wp=wp,
                                n_rows=n_rows)


def _conv_kernel_fused(x_ref, w_ref, s_ref, b_ref, o_ref, *, kh: int,
                       kw: int, wp: int, n_rows: int, relu: bool):
    """Accumulation + dequant epilogue: the s32 tile never leaves
    VMEM — output is ``acc·scale + bias`` in the float dtype (half the
    HBM write of the s32 form, and no separate dequant pass), or
    requantized s8 for chained int8 consumers (quarter the write)."""
    acc = _accumulate_taps(x_ref[0], w_ref, kh=kh, kw=kw, wp=wp,
                           n_rows=n_rows)
    o_ref[0] = _epilogue(acc, s_ref, b_ref, o_ref.dtype, relu)


@functools.partial(jax.jit,
                   static_argnames=("kh", "kw", "wp", "tcout",
                                    "out_dtype", "relu", "interpret"))
def _conv_flat(xg: jax.Array, w: jax.Array, kh: int, kw: int, wp: int,
               tcout: int, interpret: bool,
               scale: Optional[jax.Array] = None,
               bias: Optional[jax.Array] = None,
               out_dtype=None, relu: bool = False) -> jax.Array:
    """``xg``: (groups, TB·npad + P, Cin) packed padded rows. Returns
    (groups, TB·npad, Cout) — per-image garbage rows still in place.
    With ``scale`` (per-Cout f32), dequant fuses into the kernel flush
    and the output is ``out_dtype`` instead of s32."""
    g, rows, cin = xg.shape
    cout = w.shape[-1]
    pmax = (kh - 1) * wp + (kw - 1)
    n_rows = rows - _round_up(pmax, 32)
    in_specs = [
        pl.BlockSpec((1, rows, cin), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((kh, kw, cin, tcout), lambda i, j: (0, 0, 0, j)),
    ]
    if scale is None:
        kern = functools.partial(_conv_kernel, kh=kh, kw=kw, wp=wp,
                                 n_rows=n_rows)
        args = (xg, w)
        odt = jnp.int32
    else:
        kern = functools.partial(_conv_kernel_fused, kh=kh, kw=kw, wp=wp,
                                 n_rows=n_rows, relu=relu)
        vec = pl.BlockSpec((1, tcout), lambda i, j: (0, j))
        in_specs += [vec, vec]
        if bias is None:
            bias = jnp.zeros((cout,), jnp.float32)
        args = (xg, w, scale.reshape(1, cout).astype(jnp.float32),
                bias.reshape(1, cout).astype(jnp.float32))
        odt = out_dtype or jnp.float32
    return pl.pallas_call(
        kern,
        grid=(g, cout // tcout),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_rows, tcout), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((g, n_rows, cout), odt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # The dx-factored tap slicing materializes relayout copies of
            # the whole row window; at large Cin (s2d-folded strided
            # layers, e.g. ResNet50 layer3 conv2: Cin=1024) that pushes
            # the scoped stack past Mosaic's default 16 MiB and the
            # compile aborts. v5e has 128 MiB VMEM; 80 MiB leaves
            # double-buffer headroom. Measured demand at the worst
            # ResNet50 tap: 19.35 MiB.
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _resolve_pads(padding, kh: int, kw: int, h: int, wdt: int,
                  strides: Tuple[int, int]):
    """Padding spec → explicit ((top,bot),(left,right)), matching XLA's
    SAME convention under strides (``lo = floor, hi = ceil`` of the
    deficit)."""
    if isinstance(padding, str):
        name = padding.upper()
        if name in ("SAME", "SAME_LOWER"):
            pads = []
            for dim, k, s in ((h, kh, strides[0]), (wdt, kw, strides[1])):
                out = -(-dim // s)                       # ceil
                total = max((out - 1) * s + k - dim, 0)
                lo = total // 2 if name == "SAME" else total - total // 2
                pads.append((lo, total - lo))
            return tuple(pads)
        if name == "VALID":
            return ((0, 0), (0, 0))
        raise ValueError(f"unsupported padding {padding!r}")
    return tuple((int(lo), int(hi)) for lo, hi in padding)


def _space_to_depth(x: jax.Array, w: jax.Array, pads,
                    strides: Tuple[int, int]):
    """Exact strided→unit-stride rewrite in the int8 domain.

    Pad x per ``pads`` (zeros are exact under s32 accumulation), round
    the padded extent up to a stride multiple, fold ``sh×sw`` phases into
    channels, and scatter the kernel taps into a
    ``(ceil(kh/sh), ceil(kw/sw), sh·sw·Cin, Cout)`` kernel so a VALID
    stride-1 conv reproduces every strided output position. Same algebra
    as the MLPerf s2d stem (``backbones/resnet.py::stem_s2d``) but kept
    bit-exact for the quantized path.
    """
    b, h, wdt, cin = x.shape
    kh, kw, _, cout = w.shape
    sh, sw = strides
    xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    hp = xp.shape[1] + (-xp.shape[1]) % sh
    wp = xp.shape[2] + (-xp.shape[2]) % sw
    xp = jnp.pad(xp, ((0, 0), (0, hp - xp.shape[1]),
                      (0, wp - xp.shape[2]), (0, 0)))
    x2 = (xp.reshape(b, hp // sh, sh, wp // sw, sw, cin)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(b, hp // sh, wp // sw, sh * sw * cin))
    kh2 = -(-kh // sh)
    kw2 = -(-kw // sw)
    w2 = jnp.zeros((kh2, kw2, sh, sw, cin, cout), w.dtype)
    for a in range(kh):
        for bb in range(kw):
            w2 = w2.at[a // sh, bb // sw, a % sh, bb % sw].set(w[a, bb])
    w2 = w2.reshape(kh2, kw2, sh * sw * cin, cout)
    ho = (h + pads[0][0] + pads[0][1] - kh) // sh + 1
    wo = (wdt + pads[1][0] + pads[1][1] - kw) // sw + 1
    return x2, w2, ho, wo


def int8_conv2d(x: jax.Array, w: jax.Array,
                padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
                strides: Tuple[int, int] = (1, 1),
                tcout: Optional[int] = None,
                batch_tile: Optional[int] = None,
                scale: Optional[jax.Array] = None,
                bias: Optional[jax.Array] = None,
                out_dtype=None, relu: bool = False) -> jax.Array:
    """``(B,H,W,Cin) s8 ⊛ (Kh,Kw,Cin,Cout) s8 → (B,Ho,Wo,Cout) s32``.

    Dilation-1, single-group NHWC/HWIO conv with exact int32 accumulation
    on the MXU's int8 mode. ``padding`` is ``"SAME"``, ``"VALID"`` or
    explicit ``((top,bot),(left,right))``. Strides > 1 are lowered to the
    unit-stride kernel through an exact space-to-depth rewrite.
    ``batch_tile`` (default: auto) packs that many images into each grid
    step so small feature maps still feed the MXU thousands of GEMM rows
    per tap. ``tcout`` overrides the output-channel tile.

    ``scale`` (per-Cout f32, typically ``act_scale · weight_scales``)
    fuses the dequant epilogue into the kernel: the s32 accumulator never
    reaches HBM and the result is ``acc·scale + bias`` in ``out_dtype``
    (default f32) — half the output write traffic of the s32 form.
    ``relu`` applies max(·,0) inside the epilogue; ``out_dtype=int8``
    additionally requantizes (saturating round) — pre-divide scale/bias
    by the consumer's activation scale. Chained int8 serving uses both.
    """
    if x.dtype != jnp.int8 or w.dtype != jnp.int8:
        raise TypeError(f"int8_conv2d needs int8 operands, got "
                        f"{x.dtype}/{w.dtype}")
    if scale is None and bias is not None:
        raise ValueError("bias requires scale (the fused epilogue); the "
                         "s32 form returns the raw accumulator")
    if x.ndim != 4 or w.ndim != 4:
        raise ValueError(f"NHWC x HWIO expected, got {x.shape}/{w.shape}")
    b, h, wdt, cin = x.shape
    kh, kw, cin2, cout = w.shape
    if cin != cin2:
        raise ValueError(f"Cin mismatch: {x.shape} vs {w.shape}")
    strides = (int(strides[0]), int(strides[1]))
    pads = _resolve_pads(padding, kh, kw, h, wdt, strides)
    if strides != (1, 1):
        x2, w2, ho, wo = _space_to_depth(x, w, pads, strides)
        out = int8_conv2d(x2, w2, padding="VALID", tcout=tcout,
                          batch_tile=batch_tile, scale=scale, bias=bias,
                          out_dtype=out_dtype, relu=relu)
        return out[:, :ho, :wo, :]
    hp = h + pads[0][0] + pads[0][1]
    wp = wdt + pads[1][0] + pads[1][1]
    ho = hp - kh + 1
    wo = wp - kw + 1
    if ho <= 0 or wo <= 0:
        raise ValueError("empty output")
    # pad the padded width up to the int8 sublane tile when cheap: tap
    # slicing then factors by dx in the kernel (kh·kw → kw relayout
    # copies, see _accumulate_taps); never at small maps where 32-wide
    # rows would multiply the dot work
    wp_aligned = _round_up(wp, 32)
    if wp_aligned != wp and wp_aligned <= 1.2 * wp:
        pads = (pads[0], (pads[1][0], pads[1][1] + wp_aligned - wp))
        wp = wp_aligned

    n_out = ho * wp                       # rows produced at width Wp
    pmax = (kh - 1) * wp + (kw - 1)       # largest tap row offset
    # per-image padded row count: covers every tap read, 32-aligned so
    # the packed (TB, npad, Cin) -> (TB*npad, Cin) collapse keeps tiling
    npad = _round_up(n_out + pmax, 32)
    tb = batch_tile or _default_tb(b, npad, cin, cout)
    tc = tcout or _default_tcout(cout, tb * npad, cin)
    if cout % tc:
        raise ValueError(f"tcout {tc} must divide Cout {cout}")
    if b % tb:
        raise ValueError(f"batch_tile {tb} must divide B {b}")

    xpad = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    xf = xpad.reshape(b, hp * wp, cin)
    xf = jnp.pad(xf, ((0, 0), (0, npad - hp * wp), (0, 0)))
    # pack TB images per grid step + a tap-overhang tail of zero rows;
    # tap reads that cross into the next image only feed that image's
    # garbage rows (o >= n_out), discarded below
    xg = xf.reshape(b // tb, tb * npad, cin)
    xg = jnp.pad(xg, ((0, 0), (0, _round_up(pmax, 32)), (0, 0)))
    acc = _conv_flat(xg, w, kh, kw, wp, tc, interpret=_use_interpret(),
                     scale=scale, bias=bias, out_dtype=out_dtype,
                     relu=relu)
    acc = acc.reshape(b, npad, cout)[:, :n_out]
    acc = acc.reshape(b, ho, wp, cout)
    return acc[:, :, :wo, :]


def _default_tb(b: int, npad: int, cin: int, cout: int) -> int:
    """Largest batch pack (divisor of B) keeping the s32 accumulator
    near 2 MB — small maps pack many images so each tap is one big GEMM."""
    tb = 1
    for cand in range(1, b + 1):
        if b % cand:
            continue
        if cand * npad * min(cout, 256) * 4 > 2 * 1024 * 1024:
            break
        tb = cand
    return tb


def _default_tcout(cout: int, rows: int, cin: int) -> int:
    """Bound the VMEM accumulator (~rows × tcout × 4B) near 2 MB."""
    tc = cout
    while tc > 128 and rows * tc * 4 > 2 * 1024 * 1024:
        tc //= 2
    return tc
