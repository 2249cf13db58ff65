#!/usr/bin/env python
"""Throughput of the int8 Pallas conv (ops/int8_conv.py) at ResNet shapes.

Baselines per shape: XLA bf16 conv (the bf16 serving path) and XLA int8
conv (what a non-Pallas quant path gets). One JSON line per config to
--out. Keep this script to few compiles (relay rule — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (H, W, Cin, Cout) stride-1 SAME 3x3 — the ResNet18/50 conv bodies
SHAPES = {
    "rn_56x64": (56, 56, 64, 64),
    "rn_28x128": (28, 28, 128, 128),
    "rn_14x256": (14, 14, 256, 256),
    "rn_7x512": (7, 7, 512, 512),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--shapes", default="rn_56x64,rn_28x128")
    ap.add_argument("--tcout", type=int, default=0,
                    help="override the Cout tile (0 = heuristic)")
    ap.add_argument("--skip_baselines", action="store_true")
    ap.add_argument("--skip_pallas", action="store_true")
    ap.add_argument("--xla_rewrites", action="store_true",
                    help="also time two pure-XLA s8 lowerings that avoid "
                         "XLA's slow s8 conv: per-tap dot_general sum and "
                         "im2col + one GEMM (s8 dot_general measured "
                         "1.04x bf16 on v5e vs 0.73x for s8 conv)")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "bench_int8_conv.jsonl"))
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on the CPU backend (interpret mode)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from neighbour_feature_pooling_tpu.ops.int8_conv import int8_conv2d
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch
    rng = np.random.default_rng(0)

    def timed(fn, *xs, caster=float):
        @jax.jit
        def chain(*xs):
            def body(i, s):
                x0 = xs[0]
                dep = (x0 ^ (s.astype(jnp.int32) & 0).astype(x0.dtype)
                       if x0.dtype == jnp.int8
                       else x0 + (s * 0).astype(x0.dtype))
                o = fn(dep, *xs[1:])
                return s + o[0, 0, 0, 0].astype(s.dtype)
            return jax.lax.fori_loop(0, args.iters, body,
                                     jnp.zeros((), jnp.float32))
        _ = caster(chain(*xs))
        t0 = time.perf_counter()
        _ = caster(chain(*xs))
        return time.perf_counter() - t0

    records = []
    for name in args.shapes.split(","):
        H, W, Cin, Cout = SHAPES[name]
        flops = 2.0 * B * H * W * 9 * Cin * Cout * args.iters
        x8 = jnp.asarray(rng.integers(-127, 128, (B, H, W, Cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, Cin, Cout)),
                         jnp.int8)

        if not args.skip_pallas:
            t = timed(lambda x, w: int8_conv2d(
                x, w, padding="SAME",
                tcout=args.tcout or None).astype(jnp.float32), x8, w8)
            records.append({"shape": name, "batch": B,
                            "kind": "pallas_int8",
                            "tcout": args.tcout or "auto",
                            "ms": round(t * 1e3 / args.iters, 3),
                            "tops": round(flops / t / 1e12, 1)})
            print(json.dumps(records[-1]), flush=True)

        if args.xla_rewrites:
            def taps_conv(x, w):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                acc = None
                for dy in range(3):
                    for dx in range(3):
                        xs = xp[:, dy:dy + H, dx:dx + W, :]
                        d = lax.dot_general(
                            xs.reshape(-1, Cin), w[dy, dx],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        acc = d if acc is None else acc + d
                return acc.reshape(B, H, W, Cout).astype(jnp.float32)

            def im2col_conv(x, w):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                cols = jnp.concatenate(
                    [xp[:, dy:dy + H, dx:dx + W, :]
                     for dy in range(3) for dx in range(3)], axis=-1)
                d = lax.dot_general(
                    cols.reshape(-1, 9 * Cin), w.reshape(9 * Cin, Cout),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return d.reshape(B, H, W, Cout).astype(jnp.float32)

            for kind, fn in (("xla_taps_int8", taps_conv),
                             ("xla_im2col_int8", im2col_conv)):
                t = timed(fn, x8, w8)
                records.append({"shape": name, "batch": B, "kind": kind,
                                "ms": round(t * 1e3 / args.iters, 3),
                                "tops": round(flops / t / 1e12, 1)})
                print(json.dumps(records[-1]), flush=True)

        if args.skip_baselines:
            continue
        dn = lax.conv_dimension_numbers(x8.shape, w8.shape,
                                        ("NHWC", "HWIO", "NHWC"))

        def xla_conv(x, w, pet):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                preferred_element_type=pet).astype(jnp.float32)

        for kind, xx, ww, pet in (
                ("xla_bf16", x8.astype(jnp.bfloat16),
                 w8.astype(jnp.bfloat16), jnp.float32),
                ("xla_int8", x8, w8, jnp.int32)):
            t = timed(lambda x, w: xla_conv(x, w, pet), xx, ww)
            records.append({"shape": name, "batch": B, "kind": kind,
                            "ms": round(t * 1e3 / args.iters, 3),
                            "tops": round(flops / t / 1e12, 1)})
            print(json.dumps(records[-1]), flush=True)

    with open(args.out, "a") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
