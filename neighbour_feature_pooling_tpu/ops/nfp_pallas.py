"""Fused Pallas TPU kernel for Neighborhood Feature Pooling.

One kernel program processes a VMEM-budgeted block of images: the
reflect-padded feature tiles live in VMEM, the k²−1 neighbor comparisons are
shifted slices of those tiles, each channel reduction runs on the VPU, and
the texture map — or, with ``fuse_gap``, just its per-neighbor spatial mean —
is written out. The (B, H, W, N, C) neighbor tensor the PyTorch reference
materializes in HBM (``/root/reference/models/pooling/nfp.py:42-47``; an 8×
activation blow-up) never exists: everything between the feature map and the
texture map stays in VMEM.

Two kernel bodies, dispatched by map size (see CLAUDE.md "Mosaic lessons"):
small texture-head maps (≤16×16 positions) use a fully-unrolled whole-image
body; larger maps (multi-stage taps up to 112×112) use an H-strip
``fori_loop`` body so only one strip's temporaries are live on the
scoped-VMEM stack.

The measure math is shared with the pure-XLA oracle (``measures.py``), so the
kernel supports every registered measure except ``mahalanobis`` (needs
per-sample statistics; served by the oracle path).

Autodiff: ``nfp`` is a ``jax.custom_vjp`` whose forward runs this kernel and
whose backward differentiates the pure-XLA oracle (``neighborhood.nfp_reference``)
— exact gradients, Pallas-speed forward. The NFP op itself has no trainable
parameters (the reference freezes its extraction convs, ``nfp.py:61, 82``);
the gradient only flows through the input to the backbone.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

from .measures import MeasureConfig, get_measure, get_separable
from .neighborhood import (
    _PAD_MODES,
    neighbor_offsets,
    nfp_output_size,
    nfp_reference,
    num_neighbors,
    pad_spatial,
)

__all__ = ["nfp", "nfp_pallas", "pallas_supported"]


def pallas_supported(measure: str, stride: int) -> bool:
    """The kernel covers the stride-1 fast path for all stat-free measures."""
    return get_measure(measure).name != "mahalanobis" and stride == 1


def _largest_divisor_leq(x: int, cap: int) -> int:
    """Largest divisor of ``x`` that is <= ``cap`` (>= 1) — tile/block sizes
    must divide the array dim exactly (fori_loop trip counts are static)
    while staying under a VMEM byte budget."""
    for cand in range(max(1, min(x, cap)), 1, -1):
        if x % cand == 0:
            return cand
    return 1


def _nfp_kernel_unrolled(x_ref, o_ref, *, radius: int, measure: str,
                         similarity: bool, p: float, eps: float,
                         q_scs: float, dilation: int, h_out: int,
                         w_out: int, fuse_gap: bool):
    """Whole-image kernel body for SMALL maps (texture-head 7×7/14×14).

    Fully static slices, neighbors unrolled, one batch-block per program.
    Mosaic handles the live ranges fine at these sizes; large maps run out
    of scoped VMEM here and take the strip-mined body below instead.
    """
    m = get_measure(measure)
    # softmax measures (attention) are intercepted by nfp_pallas and
    # recursed as 'dot' + an XLA softmax epilogue; no kernel body sees them
    assert not m.needs_softmax_over_neighbors
    cfg = MeasureConfig(eps=eps, p=p, q_scs=q_scs)
    xp = x_ref[...].astype(jnp.float32)  # (BB, Hp, Wp, C)
    r = radius * dilation
    center = xp[:, r:r + h_out, r:r + w_out, :]

    cols = []
    for (i, j) in neighbor_offsets(radius):
        hi, wj = i * dilation, j * dilation
        nb = xp[:, hi:hi + h_out, wj:wj + w_out, :]
        cols.append(m.pairwise(center, nb, -1, cfg))  # (BB, H', W')
    out = jnp.stack(cols, axis=1)  # (BB, N, H', W')
    out = m.finalize(out, similarity)

    if fuse_gap:
        acc = jnp.sum(jnp.sum(out, axis=3, keepdims=True),
                      axis=2, keepdims=True)  # (BB, N, 1, 1)
        o_ref[:, 0, :] = (acc[:, :, 0, 0]
                          / float(h_out * w_out)).astype(o_ref.dtype)
    else:
        o_ref[...] = out.astype(o_ref.dtype)


def _nfp_kernel(x_ref, o_ref, *, radius: int, measure: str, similarity: bool,
                p: float, eps: float, q_scs: float, dilation: int,
                h_out: int, w_out: int, fuse_gap: bool, strip: int):
    """Strip-mined NFP kernel body.

    Everything is STATIC — the H axis is processed in strips of ``strip``
    rows with the 8-neighbor comparisons unrolled per strip, so only one
    strip's elementwise temporaries are ever live (an unrolled full-map
    kernel runs out of scoped VMEM at 112×112: 73 MB vs the 16 MB limit)
    and no dynamic indexing is required (dynamic lane stores and one-hot
    accumulation both hit Mosaic relayout limitations).
    """
    m = get_measure(measure)
    assert not m.needs_softmax_over_neighbors  # intercepted by nfp_pallas
    cfg = MeasureConfig(eps=eps, p=p, q_scs=q_scs)
    r = radius * dilation
    offsets = neighbor_offsets(radius)
    n = len(offsets)
    bb = x_ref.shape[0]
    n_strips = h_out // strip  # strip divides h_out (chosen by the caller)

    def strip_body(si, sums):
        h0 = si * strip
        center = x_ref[:, pl.ds(r + h0, strip), r: r + w_out, :].astype(
            jnp.float32)
        parts = []
        for ni, (i, j) in enumerate(offsets):  # static unroll, k²−1
            wj = j * dilation
            nb = x_ref[:, pl.ds(i * dilation + h0, strip),
                       wj: wj + w_out, :].astype(jnp.float32)
            col = m.pairwise(center, nb, -1, cfg)  # (BB, strip, W')
            if fuse_gap:
                # two single-axis keepdims reductions: Mosaic cannot lower
                # a multi-trailing-dim reduce fused with the channel reduce
                parts.append(jnp.sum(jnp.sum(col, axis=2, keepdims=True),
                                     axis=1, keepdims=True))  # (BB, 1, 1)
            else:
                col = m.finalize(col, similarity)
                o_ref[:, ni, pl.ds(h0, strip), :] = col.astype(o_ref.dtype)
        if fuse_gap:
            return sums + jnp.concatenate(parts, axis=-1)  # (BB, 1, N)
        return sums

    sums0 = jnp.zeros((bb, 1, n), jnp.float32)
    sums = jax.lax.fori_loop(0, n_strips, strip_body, sums0)

    if fuse_gap:
        acc = sums[:, 0, :] / float(h_out * w_out)  # (BB, N)
        o_ref[:, 0, :] = m.finalize(acc, similarity).astype(o_ref.dtype)


def _nfp_kernel_chw(x_ref, o_ref, *, radius: int, measure: str,
                    similarity: bool, p: float, eps: float, q_scs: float,
                    dilation: int, h_out: int, w_out: int, fuse_gap: bool,
                    strip: int, n_chan: int, vec_c: bool):
    """Large-map kernel body, channels-first layout (bb, C, Hp, Wp).

    The VPU's vector registers are (8 sublanes × 128 lanes) with the MINOR
    axis on the lanes. The NHWC bodies put channels minor — at the
    multi-stage taps (112×112×16, 56×56×24, …) that wastes 7/8 of the lanes.
    Here W sits on the lanes (112 ≈ 128) and H-strip rows on the sublanes;
    the channel reduction uses each measure's accumulable form
    (``measures.SEPARABLE``), so no cross-lane reduction exists at all.
    Input blocks are DMA'd HBM→VMEM by Pallas's grid pipeline
    (double-buffered across programs).

    Two channel-sum strategies, selected by ``vec_c``:
    * False — per-channel ``fori_loop`` accumulating (bb, 1, strip, W')
      terms: minimal VMEM, the measured winner at small C;
    * True — whole-C (bb, C, strip, W') slices reduced with one
      non-minor-axis ``jnp.sum``: fewer, larger VPU ops, the measured
      winner for fused-GAP at C≈64 (costs (n_acc+2) whole-C strip
      temporaries, so the caller picks a smaller strip).
    """
    m = get_measure(measure)
    assert not m.needs_softmax_over_neighbors  # intercepted by nfp_pallas
    sep = get_separable(measure)
    cfg = MeasureConfig(eps=eps, p=p, q_scs=q_scs)
    r = radius * dilation
    offsets = neighbor_offsets(radius)
    n = len(offsets)
    bb = x_ref.shape[0]
    n_strips = h_out // strip

    def strip_body(si, gap_sums):
        h0 = si * strip
        if vec_c:
            csl_all = x_ref[:, :, pl.ds(r + h0, strip),
                            r:r + w_out].astype(jnp.float32)
        parts = []
        for ni, (i, j) in enumerate(offsets):  # static unroll, k²−1
            wj = j * dilation
            if vec_c:
                nsl = x_ref[:, :, pl.ds(i * dilation + h0, strip),
                            wj:wj + w_out].astype(jnp.float32)
                sums = tuple(jnp.sum(t, axis=1, keepdims=True)
                             for t in sep.map_terms(csl_all, nsl, cfg))
            else:
                def chan_body(ci, accs, _i=i, _wj=wj, _h0=h0):
                    csl = x_ref[:, pl.ds(ci, 1), pl.ds(r + _h0, strip),
                                r:r + w_out].astype(jnp.float32)
                    nsl = x_ref[:, pl.ds(ci, 1),
                                pl.ds(_i * dilation + _h0, strip),
                                _wj:_wj + w_out].astype(jnp.float32)
                    terms = sep.map_terms(csl, nsl, cfg)
                    return tuple(a + t for a, t in zip(accs, terms))

                accs0 = tuple(jnp.zeros((bb, 1, strip, w_out), jnp.float32)
                              for _ in range(sep.n_acc))
                sums = jax.lax.fori_loop(0, n_chan, chan_body, accs0)
            val = sep.finalize_sums(sums, n_chan, cfg)  # (bb,1,strip,w')
            if fuse_gap:
                s3 = jnp.sum(val, axis=3, keepdims=True)
                s2 = jnp.sum(s3, axis=2, keepdims=True)  # (bb,1,1,1)
                parts.append(s2[:, 0])                   # (bb,1,1)
            else:
                val = m.finalize(val, similarity)
                o_ref[:, ni, pl.ds(h0, strip), :] = val[:, 0].astype(
                    o_ref.dtype)
        if fuse_gap:
            return gap_sums + jnp.concatenate(parts, axis=-1)  # (bb,1,N)
        return gap_sums

    sums0 = jnp.zeros((bb, 1, n), jnp.float32)
    sums = jax.lax.fori_loop(0, n_strips, strip_body, sums0)
    if fuse_gap:
        acc = sums[:, 0, :] / float(h_out * w_out)  # (bb, N)
        o_ref[:, 0, :] = m.finalize(acc, similarity).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "measure", "similarity", "p", "eps", "q_scs",
                     "padding", "dilation", "padding_mode", "fuse_gap",
                     "interpret", "chw_body"),
)
def nfp_pallas(
    x: jax.Array,
    radius: int = 1,
    measure: str = "cosine",
    *,
    similarity: bool = True,
    p: float = 1.0,
    eps: float = 1e-6,
    q_scs: float = 1e-6,
    padding: int = 0,
    dilation: int = 1,
    padding_mode: str = "reflect",
    fuse_gap: bool = False,
    interpret: bool = False,
    chw_body: str = "auto",
) -> jax.Array:
    """Run the fused NFP(+GAP) kernel on an NHWC feature map (stride 1).

    ``chw_body`` selects the large-map channels-first body: ``"fori"``
    (per-channel accumulation loop), ``"vec"`` (whole-C vector slices), or
    ``"auto"`` (measured policy; see the dispatch notes above ``nfp``).
    """
    m = get_measure(measure)
    if m.needs_softmax_over_neighbors:
        # attention = softmax(dot) per position. The kernel computes the raw
        # dot texture map; softmax over the neighbor dim runs outside in XLA
        # (Mosaic cannot lower the non-trailing-dim softmax in-kernel:
        # "Unsupported output implicit dimension"), and pooling, when
        # requested, follows the softmax (mean-of-softmax != softmax-of-mean).
        raw = nfp_pallas(x, radius, "dot", similarity=True, p=p, eps=eps,
                         q_scs=q_scs, padding=padding, dilation=dilation,
                         padding_mode=padding_mode, fuse_gap=False,
                         interpret=interpret, chw_body=chw_body)
        out = m.finalize(jax.nn.softmax(raw, axis=-1), similarity)
        if fuse_gap:
            return jnp.mean(out, axis=(1, 2))
        return out
    b, h, w, c = x.shape
    n = num_neighbors(radius)
    h_out = nfp_output_size(h, radius, 1, padding, dilation)
    w_out = nfp_output_size(w, radius, 1, padding, dilation)
    if h_out < 1 or w_out < 1:
        raise ValueError(
            f"NFP output size {h_out}x{w_out} invalid for input {h}x{w}, "
            f"R={radius}, padding={padding}, dilation={dilation}")

    xp = pad_spatial(x, padding, padding_mode)
    hp, wp = xp.shape[1], xp.shape[2]

    # Batch-block: one program handles BB images. Small feature maps (the
    # ResNet/ViT 7x7-14x14 heads) would otherwise launch B tiny programs and
    # be dispatch-bound. Input-tile budget ~2 MB per program.
    bytes_per_img = hp * wp * c * 4
    bb_cap = max(1, (2 << 20) // max(bytes_per_img, 1))
    bb = _largest_divisor_leq(b, bb_cap)

    # Kernel outputs are always fp32 (the in-kernel math is fp32; bf16
    # stores hit Mosaic's unimplemented "Lane broadcast" lowering); the
    # final cast back to x.dtype happens outside and fuses into consumers.
    if fuse_gap:
        # (BB, 1, N) keeps the last-two block dims equal to the array dims,
        # as the Mosaic lowering requires; squeezed to (B, N) below.
        out_shape = jax.ShapeDtypeStruct((b, 1, n), jnp.float32)
        out_spec = pl.BlockSpec((bb, 1, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        # neighbor-major layout (B, N, H', W'): the kernel's per-neighbor
        # store then indexes a non-minor dim; transposed to NHWC below
        out_shape = jax.ShapeDtypeStruct((b, n, h_out, w_out), jnp.float32)
        out_spec = pl.BlockSpec((bb, n, h_out, w_out),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)

    operand = xp
    in_spec = pl.BlockSpec((bb, hp, wp, c), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    if h_out * w_out <= 256:
        # small texture-head maps: whole-image unrolled body
        kernel = functools.partial(
            _nfp_kernel_unrolled, radius=radius, measure=measure,
            similarity=similarity, p=p, eps=eps, q_scs=q_scs,
            dilation=dilation, h_out=h_out, w_out=w_out, fuse_gap=fuse_gap,
        )
    elif get_separable(measure) is not None:
        # large maps, channel-accumulable measure: channels-first layout
        # with W on the VPU lanes. Two bodies (measured policy in the
        # dispatch notes above ``nfp``): per-channel fori accumulation
        # fori accumulation or whole-C vector slices (_nfp_kernel_chw vec_c).
        sep = get_separable(measure)
        if chw_body not in ("auto", "fori", "vec"):
            raise ValueError(f"unknown chw_body {chw_body!r}")
        use_vec = (chw_body == "vec" if chw_body != "auto"
                   else c > _PALLAS_CHW_VEC_MIN_CHANNELS)
        if use_vec:
            # (n_acc+2) whole-C strip temporaries live at once
            denom = (sep.n_acc + 2) * bb * c * w_out * 4
        else:
            denom = (sep.n_acc + 3) * bb * w_out * 4
        strip_chw = _largest_divisor_leq(
            h_out, (4 << 20) // max(denom, 1))
        kernel = functools.partial(
            _nfp_kernel_chw, radius=radius, measure=measure,
            similarity=similarity, p=p, eps=eps, q_scs=q_scs,
            dilation=dilation, h_out=h_out, w_out=w_out, fuse_gap=fuse_gap,
            strip=strip_chw, n_chan=c, vec_c=use_vec,
        )
        operand = jnp.transpose(xp, (0, 3, 1, 2))  # (B, C, Hp, Wp)
        in_spec = pl.BlockSpec((bb, c, hp, wp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        # Strip size: the kernel unrolls the k²−1 neighbor comparisons per
        # H-strip, so ~24 strip-sized fp32 temporaries are live at once;
        # keep them within ~4 MB of scoped VMEM. Must divide h_out (the
        # strip loop is a fori_loop with a static trip count).
        strip = _largest_divisor_leq(
            h_out, (4 << 20) // max(24 * bb * w_out * c * 4, 1))
        kernel = functools.partial(
            _nfp_kernel, radius=radius, measure=measure,
            similarity=similarity, p=p, eps=eps, q_scs=q_scs,
            dilation=dilation, h_out=h_out, w_out=w_out, fuse_gap=fuse_gap,
            strip=strip,
        )
    flops_per_pair = 6  # rough: diff/mul + reduce + epilogue, per channel
    cost = pl.CostEstimate(
        flops=b * h_out * w_out * n * c * flops_per_pair,
        bytes_accessed=xp.size * xp.dtype.itemsize + (b * n * (1 if fuse_gap else h_out * w_out)) * 4,
        transcendentals=b * h_out * w_out * n,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(operand)
    out = out.astype(x.dtype)
    if fuse_gap:
        return out.reshape(b, n)
    return jnp.transpose(out, (0, 2, 3, 1))  # (B, H', W', N)


# ---------------------------------------------------------------------------
# Public differentiable op
# ---------------------------------------------------------------------------


from .common import use_interpret as _use_interpret  # noqa: E402


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
)
def nfp(
    x: jax.Array,
    radius: int = 1,
    measure: str = "cosine",
    similarity: bool = True,
    p: float = 1.0,
    eps: float = 1e-6,
    q_scs: float = 1e-6,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    padding_mode: str = "reflect",
    data_format: str = "NHWC",
    fuse_gap: bool = False,
) -> jax.Array:
    """Neighborhood Feature Pooling (differentiable, Pallas-accelerated).

    Dispatches to the fused Pallas kernel when eligible (stride 1, stat-free
    measure, NHWC-convertible input) and to the pure-XLA oracle otherwise.
    See ``neighborhood.nfp_reference`` for argument semantics.
    """
    return _nfp_fwd(x, radius, measure, similarity, p, eps, q_scs, stride,
                    padding, dilation, padding_mode, data_format, fuse_gap)[0]


#: dispatch policy, measured on v5e-1 (see PARITY.md "NFP kernel vs oracle"
#: for the tables and the run-to-run variance caveat):
#: * texture-head maps (≤256 positions): kernel, bit-exact and never slower;
#: * large maps with a channel-accumulable measure and C ≤ 48: the
#:   channels-first fori body (W on the VPU lanes, per-channel
#:   accumulation) — at worst ≈ the XLA oracle, and up to several× faster
#:   on oracle-unfriendly days (the oracle's fusion quality varies);
#: * C 49–64 fused-GAP: the whole-C vector body (``_nfp_kernel_chw`` with ``vec_c``),
#:   the one measured C=64 win (1.22× within-process); C ≥ 64 full maps
#:   stay with the oracle.
_PALLAS_MAX_POSITIONS = 256
_PALLAS_CHW_MAX_CHANNELS = 48
#: fused-GAP outputs route to the kernel up to this channel count (vec body)
_PALLAS_CHW_GAP_MAX_CHANNELS = 64
#: channels-first body choice in "auto": above this channel count the
#: whole-C vector body replaces the per-channel fori accumulation
_PALLAS_CHW_VEC_MIN_CHANNELS = 48


def _forward_value(x, radius, measure, similarity, p, eps, q_scs, stride,
                   padding, dilation, padding_mode, data_format, fuse_gap):
    h_axis, w_axis = (2, 3) if data_format == "NCHW" else (1, 2)
    c_axis = 1 if data_format == "NCHW" else 3
    h_out = nfp_output_size(x.shape[h_axis], radius, stride, padding, dilation)
    w_out = nfp_output_size(x.shape[w_axis], radius, stride, padding, dilation)
    small_map = h_out * w_out <= _PALLAS_MAX_POSITIONS
    chw_cap = (_PALLAS_CHW_GAP_MAX_CHANNELS if fuse_gap
               else _PALLAS_CHW_MAX_CHANNELS)
    chw_eligible = (get_separable(measure) is not None
                    and x.shape[c_axis] <= chw_cap)
    if pallas_supported(measure, stride) and (small_map or chw_eligible):
        xh = jnp.transpose(x, (0, 2, 3, 1)) if data_format == "NCHW" else x
        out = nfp_pallas(
            xh, radius, measure, similarity=similarity, p=p, eps=eps,
            q_scs=q_scs, padding=padding, dilation=dilation,
            padding_mode=padding_mode, fuse_gap=fuse_gap,
            interpret=_use_interpret(),
        )
        if not fuse_gap and data_format == "NCHW":
            out = jnp.transpose(out, (0, 3, 1, 2))
        return out
    return nfp_reference(
        x, radius, measure, similarity=similarity, p=p, eps=eps, q_scs=q_scs,
        stride=stride, padding=padding, dilation=dilation,
        padding_mode=padding_mode, data_format=data_format, fuse_gap=fuse_gap,
    )


def _sp_eligible_static(radius, stride, padding, dilation, padding_mode,
                        data_format, measure):
    """Spatial (H-axis) partitioning is defined for the "same"-output
    configuration every production head uses (stride 1, padding = R·d,
    NHWC): output row i depends on input rows i±R·d only, so an H-sharded
    shard needs exactly an R·d-row halo from each neighbor shard.

    ``mahalanobis`` is excluded: its inverse-variance statistics are
    computed over each sample's FULL spatial extent
    (``neighborhood._measure_config``), so a per-shard evaluation (halo
    rows included) would silently change the result."""
    return (stride == 1 and padding == radius * dilation
            and data_format == "NHWC"
            and get_measure(measure).name != "mahalanobis"
            and padding_mode in ("reflect", "zeros", "replicate", "circular"))


def _halo_extend(x, axis_name, n_shards, rd, padding_mode):
    """Exchange an ``rd``-row halo with the neighbor shards along the H axis
    (NHWC dim 1) via ``ppermute`` and apply the *global* edge padding on the
    boundary shards, so ``concat([top, x, bot])`` is each shard's slice of
    the globally H-padded image. ``circular`` is a full ring (the wrap rows
    ARE the other end's halo); the open modes fix up shard 0 / n−1 locally.
    """
    down = [(i, (i + 1) % n_shards) for i in range(
        n_shards if padding_mode == "circular" else n_shards - 1)]
    up = [(dst, src) for (src, dst) in down]
    top = jax.lax.ppermute(x[:, -rd:], axis_name, down)
    bot = jax.lax.ppermute(x[:, :rd], axis_name, up)
    if padding_mode != "circular":
        if padding_mode == "reflect":
            top_edge = x[:, 1:rd + 1][:, ::-1]
            bot_edge = x[:, -rd - 1:-1][:, ::-1]
        elif padding_mode == "replicate":
            top_edge = jnp.repeat(x[:, :1], rd, axis=1)
            bot_edge = jnp.repeat(x[:, -1:], rd, axis=1)
        else:  # zeros
            top_edge = jnp.zeros_like(x[:, :rd])
            bot_edge = top_edge
        idx = jax.lax.axis_index(axis_name)
        top = jnp.where(idx == 0, top_edge, top)
        bot = jnp.where(idx == n_shards - 1, bot_edge, bot)
    return jnp.concatenate([top, x, bot], axis=1)


@functools.lru_cache(maxsize=None)
def _partitioned_forward(radius, measure, similarity, p, eps, q_scs, stride,
                         padding, dilation, padding_mode, data_format,
                         fuse_gap):
    """SPMD partitioning rule: batch pass-through + H-axis halo exchange.

    XLA's SPMD partitioner treats ``pallas_call`` as an opaque custom call,
    so on a multi-chip mesh a batch-sharded feature map would be
    ALL-GATHERED around the kernel (full map on every chip) before this op
    and the result re-sliced after. This ``custom_partitioning`` wrapper
    declares dim 0 (batch) of operand and result as pass-through, so each
    shard runs the kernel on its local rows with no collective.

    For the "same"-output configuration (stride 1, padding = R·d, NHWC —
    every production head) the H axis is *also* partitionable: a shard's
    output rows need only an R·d-row halo from its neighbors, exchanged
    with two ``ppermute``s (+ a ``pmean`` over the spatial axis for the
    fused-GAP head). That is how XLA itself spatially partitions
    convolutions; this rule extends the same treatment to the opaque Pallas
    call, so megapixel feature maps can shard over chips. Dims that a rule
    cannot handle (W, C; H when the config or shard geometry is
    ineligible) fall back to needs-replication. Covers both the Shardy
    partitioner (``sharding_rule``) and the legacy GSPMD callbacks.
    """
    out_rank = 2 if fuse_gap else 4
    sp_ok = _sp_eligible_static(radius, stride, padding, dilation,
                                padding_mode, data_format, measure)
    rd = radius * dilation

    def _local(x):
        return _forward_value(x, radius, measure, similarity, p, eps, q_scs,
                              stride, padding, dilation, padding_mode,
                              fuse_gap=fuse_gap, data_format=data_format)

    fwd = custom_partitioning(_local)

    def _batch_only(sharding, rank):
        spec = getattr(sharding, "spec", None)
        batch = spec[0] if spec is not None and len(spec) > 0 else None
        return NamedSharding(sharding.mesh,
                             PartitionSpec(batch, *([None] * (rank - 1))))

    def _sp_axis(mesh, arg_shape):
        """The single mesh axis H is sharded over, when the halo path can
        serve it (even shards, each taller than the halo); else None."""
        spec = getattr(arg_shape.sharding, "spec", None)
        h = spec[1] if spec is not None and len(spec) > 1 else None
        if h is None:
            return None
        names = (h,) if isinstance(h, str) else tuple(h)
        if len(names) != 1:
            return None
        n = mesh.shape[names[0]]
        h_glob = arg_shape.shape[1]
        if n <= 1 or h_glob % n or h_glob // n <= rd:
            return None
        return names[0]

    def partition(mesh, arg_shapes, result_shape):
        arg_sharding = arg_shapes[0].sharding
        ax = _sp_axis(mesh, arg_shapes[0]) if sp_ok else None
        if ax is None:
            return (mesh, _local, _batch_only(arg_sharding, out_rank),
                    (_batch_only(arg_sharding, 4),))

        n = mesh.shape[ax]
        spec = arg_sharding.spec
        batch = spec[0] if len(spec) > 0 else None
        arg_spec = PartitionSpec(batch, ax, None, None)
        out_spec = (PartitionSpec(batch, None) if fuse_gap
                    else PartitionSpec(batch, ax, None, None))

        def _sp_local(x):
            xe = _halo_extend(x, ax, n, rd, padding_mode)
            if padding:  # W padding stays a local op
                xe = jnp.pad(xe, ((0, 0), (0, 0), (padding, padding), (0, 0)),
                             mode=_PAD_MODES[padding_mode])
            out = _forward_value(xe, radius, measure, similarity, p, eps,
                                 q_scs, stride, 0, dilation, padding_mode,
                                 fuse_gap=fuse_gap, data_format=data_format)
            if fuse_gap:
                # equal shards: the global spatial mean is the mean of the
                # per-shard means
                out = jax.lax.pmean(out, ax)
            return out

        return (mesh, _sp_local, NamedSharding(mesh, out_spec),
                (NamedSharding(mesh, arg_spec),))

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        ax = _sp_axis(mesh, arg_shapes[0]) if sp_ok else None
        if ax is None or fuse_gap:
            base = _batch_only(arg_shapes[0].sharding, out_rank)
            return base
        spec = arg_shapes[0].sharding.spec
        batch = spec[0] if len(spec) > 0 else None
        return NamedSharding(mesh, PartitionSpec(batch, ax, None, None))

    if sp_ok:
        out_factors = "b s" if fuse_gap else "b h r s"
        repl = ("j", "k", "s") if fuse_gap else ("j", "k", "r", "s")
        rule = f"b h j k -> {out_factors}"
    else:
        out_factors = "b s" if fuse_gap else "b q r s"
        repl = (("i", "j", "k", "s") if fuse_gap
                else ("i", "j", "k", "q", "r", "s"))
        rule = f"b i j k -> {out_factors}"
    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=repl,
    )
    return fwd


def _nfp_fwd(x, radius, measure, similarity, p, eps, q_scs, stride, padding,
             dilation, padding_mode, data_format, fuse_gap):
    if jax.device_count() > 1:
        # multi-device environment: route through the batch-partitionable
        # wrapper so sharded callers never gather the feature map
        out = _partitioned_forward(radius, measure, similarity, p, eps, q_scs,
                                   stride, padding, dilation, padding_mode,
                                   data_format, fuse_gap)(x)
    else:
        out = _forward_value(x, radius, measure, similarity, p, eps, q_scs,
                             stride, padding, dilation, padding_mode,
                             data_format, fuse_gap)
    return out, x


def _nfp_bwd(radius, measure, similarity, p, eps, q_scs, stride, padding,
             dilation, padding_mode, data_format, fuse_gap, x, g):
    # Exact gradient via the pure-XLA oracle; XLA fuses the recompute into
    # the backward graph, and the op is cheap relative to the backbone.
    def f(xx):
        return nfp_reference(
            xx, radius, measure, similarity=similarity, p=p, eps=eps,
            q_scs=q_scs, stride=stride, padding=padding, dilation=dilation,
            padding_mode=padding_mode, data_format=data_format,
            fuse_gap=fuse_gap,
        )

    _, vjp = jax.vjp(f, x)
    (dx,) = vjp(g)
    return (dx,)


nfp.defvjp(_nfp_fwd, _nfp_bwd)
