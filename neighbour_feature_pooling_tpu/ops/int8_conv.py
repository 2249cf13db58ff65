"""int8 2-D convolution on the MXU — Pallas, no im2col materialization.

Why this exists (measured, v5e-1, PARITY.md round 3): XLA lowers
``conv_general_dilated(s8, s8 → s32)`` to the *bf16* MXU mode (0.73× the
bf16 conv), so PTQ serving (``quant.py``) gains nothing on conv
backbones. Mosaic *does* emit the MXU's native int8 mode (1.9× bf16 for
the same matmul body, ``ops/int8_gemm.py``). This kernel converts spatial
convs — the dominant serving FLOPs of ResNet18/50 — into that mode.

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

Grid ``(B, Cout/TCout)``: each step owns one image's flattened rows and
one output-channel tile; the 9 taps accumulate in registers/VMEM as one
s32 value. Stride 1, dilation 1, groups 1 (everything else stays on the
XLA conv path — ``quant.py`` routes only eligible layers here).

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

__all__ = ["int8_conv2d"]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _conv_kernel(x_ref, w_ref, o_ref, *, kh: int, kw: int, wp: int,
                 n_out: int):
    x = x_ref[0]                      # (Npad, Cin) s8
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            p = dy * wp + dx
            a = x[p:p + n_out, :]     # contiguous rows
            d = jnp.dot(a, w_ref[dy, dx],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
    o_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("kh", "kw", "wp", "n_out", "tcout",
                                    "interpret"))
def _conv_flat(xf: jax.Array, w: jax.Array, kh: int, kw: int, wp: int,
               n_out: int, tcout: int, interpret: bool) -> jax.Array:
    b, npad, cin = xf.shape
    cout = w.shape[-1]
    kern = functools.partial(_conv_kernel, kh=kh, kw=kw, wp=wp,
                             n_out=n_out)
    return pl.pallas_call(
        kern,
        grid=(b, cout // tcout),
        in_specs=[
            pl.BlockSpec((1, npad, cin), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((kh, kw, cin, tcout),
                         lambda i, j: (0, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, n_out, tcout), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n_out, cout), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(xf, w)


def int8_conv2d(x: jax.Array, w: jax.Array,
                padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
                tcout: Optional[int] = None) -> jax.Array:
    """``(B,H,W,Cin) s8 ⊛ (Kh,Kw,Cin,Cout) s8 → (B,Ho,Wo,Cout) s32``.

    Stride-1, dilation-1, single-group NHWC/HWIO conv with exact int32
    accumulation on the MXU's int8 mode. ``padding`` is ``"SAME"``,
    ``"VALID"`` or explicit ``((top,bot),(left,right))``.
    """
    if x.dtype != jnp.int8 or w.dtype != jnp.int8:
        raise TypeError(f"int8_conv2d needs int8 operands, got "
                        f"{x.dtype}/{w.dtype}")
    if x.ndim != 4 or w.ndim != 4:
        raise ValueError(f"NHWC x HWIO expected, got {x.shape}/{w.shape}")
    b, h, wdt, cin = x.shape
    kh, kw, cin2, cout = w.shape
    if cin != cin2:
        raise ValueError(f"Cin mismatch: {x.shape} vs {w.shape}")
    if isinstance(padding, str):
        if padding.upper() == "SAME":
            pads = (((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2))
        elif padding.upper() == "VALID":
            pads = ((0, 0), (0, 0))
        else:
            raise ValueError(f"unsupported padding {padding!r}")
    else:
        pads = tuple((int(lo), int(hi)) for lo, hi in padding)
    hp = h + pads[0][0] + pads[0][1]
    wp = wdt + pads[1][0] + pads[1][1]
    ho = hp - kh + 1
    wo = wp - kw + 1
    if ho <= 0 or wo <= 0:
        raise ValueError("empty output")

    n_out = ho * wp                       # rows produced at width Wp
    npad = n_out + (kh - 1) * wp + (kw - 1)   # max slice end
    xpad = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    xf = xpad.reshape(b, hp * wp, cin)
    if npad > hp * wp:
        xf = jnp.pad(xf, ((0, 0), (0, npad - hp * wp), (0, 0)))
    tc = tcout or _default_tcout(cout, n_out, cin)
    if cout % tc:
        raise ValueError(f"tcout {tc} must divide Cout {cout}")
    acc = _conv_flat(xf, w, kh, kw, wp, n_out, tc,
                     interpret=_use_interpret())
    acc = acc.reshape(b, ho, wp, cout)
    return acc[:, :, :wo, :]


def _default_tcout(cout: int, n_out: int, cin: int) -> int:
    """Bound the VMEM accumulator (~n_out × tcout × 4B) near 2 MB."""
    tc = cout
    while tc > 128 and n_out * tc * 4 > 2 * 1024 * 1024:
        tc //= 2
    return tc
