"""Tuned int8 GEMM on the MXU — the engine under int8 serving.

History (measured, v5e-1, PARITY.md "int8 MXU kernels — measured"): an
isolated Mosaic probe suggested the MXU's int8 mode ran 1.90× bf16
where XLA's s8 conv lowering manages 0.73× — this kernel was built on
that bet, and the full hardware session then failed to reproduce the
probe: at 4096³ this kernel reaches 82.8 TOPS vs 104.6 for XLA bf16
and 109.2 for XLA's own s8 ``dot_general`` (which is the route
``quant.py`` now uses by default). The kernel stays **opt-in**
(``QuantConfig(use_mxu_gemm=True)``) — bit-exact, tile-tunable, the
ready vehicle for hardware where native-int8 actually outruns bf16.

Kernel shape: grid ``(M/TM, N/TN, K/TK)`` with the K axis innermost and
``arbitrary`` (sequential) semantics; an fp32-free int32 accumulator
tile lives in VMEM scratch across the K steps; Mosaic double-buffers the
A/B block DMAs. Inputs are padded to tile multiples on the host side of
the call (XLA pads — cheap next to the GEMM).

The reference has no analog (its quantization story is absent entirely;
serving stops at ``trainer.test``, ``/root/reference/demo.py:427``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dequant_epilogue
from .common import use_interpret as _use_interpret

__all__ = ["int8_gemm"]


def _gemm_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _flush():
        o_ref[:] = acc_ref[:]


def _gemm_kernel_fused(a_ref, b_ref, s_ref, bias_ref, o_ref, acc_ref, *,
                       k_steps: int, relu: bool):
    """K-accumulating GEMM + dequant epilogue: the flush emits
    ``acc·scale + bias`` in the float dtype — the s32 tile never leaves
    VMEM (half the HBM write of the s32 form, no separate dequant pass) —
    or requantized s8 for chained int8 consumers (quarter the write)."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _flush():
        o_ref[:] = dequant_epilogue(acc_ref[:], s_ref, bias_ref,
                                    o_ref.dtype, relu)


def _pad_to(x: jax.Array, mult: Tuple[int, int]) -> jax.Array:
    pm = (-x.shape[0]) % mult[0]
    pn = (-x.shape[1]) % mult[1]
    if pm or pn:
        x = jnp.pad(x, ((0, pm), (0, pn)))
    return x


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk",
                                             "out_dtype", "relu",
                                             "interpret"))
def _int8_gemm_padded(a: jax.Array, b: jax.Array,
                      tm: int, tn: int, tk: int,
                      interpret: bool = False,
                      scale: Optional[jax.Array] = None,
                      bias: Optional[jax.Array] = None,
                      out_dtype=None, relu: bool = False) -> jax.Array:
    m, k = a.shape
    _, n = b.shape
    k_steps = k // tk
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j)),
    ]
    if scale is None:
        kern = functools.partial(_gemm_kernel, k_steps=k_steps)
        args = (a, b)
        odt = jnp.int32
    else:
        kern = functools.partial(_gemm_kernel_fused, k_steps=k_steps,
                                 relu=relu)
        vec = pl.BlockSpec((1, tn), lambda i, j, kk: (0, j))
        in_specs += [vec, vec]
        if bias is None:
            bias = jnp.zeros((n,), jnp.float32)
        args = (a, b, scale.reshape(1, n).astype(jnp.float32),
                bias.reshape(1, n).astype(jnp.float32))
        odt = out_dtype or jnp.float32
    return pl.pallas_call(
        kern,
        grid=(m // tm, n // tn, k_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)


def int8_gemm(a: jax.Array, b: jax.Array,
              tiles: Optional[Tuple[int, int, int]] = None,
              scale: Optional[jax.Array] = None,
              bias: Optional[jax.Array] = None,
              out_dtype=None, relu: bool = False) -> jax.Array:
    """``(M, K) int8 × (K, N) int8 → (M, N) int32`` on the MXU int8 mode.

    Shapes need not be tile-aligned; inputs are zero-padded (zeros
    contribute nothing to the s32 accumulation) and the output sliced
    back. ``tiles=(TM, TN, TK)`` overrides the default tiling.

    ``scale`` (per-N f32, typically ``act_scale · weight_scales``) fuses
    the dequant epilogue into the kernel flush: the result is
    ``acc·scale + bias`` in ``out_dtype`` (default f32) and the s32
    accumulator never reaches HBM.
    """
    if a.dtype != jnp.int8 or b.dtype != jnp.int8:
        raise TypeError(f"int8_gemm needs int8 operands, got "
                        f"{a.dtype}/{b.dtype}")
    if scale is None and bias is not None:
        raise ValueError("bias requires scale (the fused epilogue); the "
                         "s32 form returns the raw accumulator")
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")
    tm, tn, tk = tiles or _default_tiles(m, n, k)
    ap = _pad_to(a, (tm, tk))
    bp = _pad_to(b, (tk, tn))
    if scale is not None:
        pn = bp.shape[1] - n
        scale = jnp.pad(scale.reshape(-1).astype(jnp.float32), (0, pn))
        if bias is not None:
            bias = jnp.pad(bias.reshape(-1).astype(jnp.float32), (0, pn))
    out = _int8_gemm_padded(ap, bp, tm, tn, tk, interpret=_use_interpret(),
                            scale=scale, bias=bias, out_dtype=out_dtype,
                            relu=relu)
    if out.shape != (m, n):
        out = out[:m, :n]
    return out


def _best_tile(x: int, cands: Tuple[int, ...]) -> int:
    """Largest candidate tile within 5% padding overhead of the best —
    a pow2-rounding default would pad e.g. N=576 (the ViT-Tiny
    fused-QKV width) to 1024, 78% wasted MXU work; 128-tiles pad it to
    640, and for a huge well-aligned M the 5% slack keeps the big tile."""
    pad = {t: x + (-x) % t for t in cands}
    floor = min(pad.values())
    return max(t for t in cands if pad[t] <= 1.05 * floor)


def _default_tiles(m: int, n: int, k: int) -> Tuple[int, int, int]:
    """Tile heuristic (swept on v5e-1, scripts/bench_int8_gemm.py)."""
    tm = _best_tile(m, (512, 256, 128, 64, 32))
    tn = _best_tile(n, (512, 256, 128))
    tk = _best_tile(k, (2048, 1024, 512, 256, 128))
    return tm, tn, tk
