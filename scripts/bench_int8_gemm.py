#!/usr/bin/env python
"""Tile sweep + throughput for the int8 Pallas GEMM (ops/int8_gemm.py).

Baselines on the same shape: XLA bf16 matmul (what the bf16 serving path
uses) and XLA int8 (what the non-Pallas quant path gets). One JSON line
per config to --out.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep tile configs instead of the default")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "bench_int8_gemm.jsonl"))
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on the CPU backend (interpret mode)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.ops.int8_gemm import int8_gemm
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    M, N, K = args.m, args.n, args.k
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    flops = 2.0 * M * N * K * args.iters

    def timed(fn, *xs, caster=int):
        # chain iters into one dependent scalar; fetch once (relay rule)
        @jax.jit
        def chain(*xs):
            def body(i, s):
                o = fn(_dep(xs[0], s), *xs[1:])
                return s + o[0, 0].astype(s.dtype)
            return jax.lax.fori_loop(0, args.iters, body,
                                     jnp.zeros((), jnp.int32))

        def _dep(x, s):  # carry-dependence so the loop body can't hoist
            return x ^ (s & 0).astype(x.dtype) if x.dtype == jnp.int8 \
                else x + (s * 0).astype(x.dtype)

        _ = caster(chain(*xs))
        t0 = time.perf_counter()
        _ = caster(chain(*xs))
        return time.perf_counter() - t0

    records = []

    if args.sweep:
        grid = itertools.product((256, 512), (256, 512),
                                 (512, 1024, 2048))
    else:
        grid = [(None, None, None)]
    for tm, tn, tk in grid:
        tiles = (tm, tn, tk) if tm else None
        try:
            t = timed(lambda a, b: int8_gemm(a, b, tiles=tiles), a8, b8)
        except Exception as e:  # noqa: BLE001 — record invalid configs
            records.append({"tiles": [tm, tn, tk], "error": str(e)[:120]})
            continue
        records.append({"kind": "pallas_int8",
                        "tiles": list(tiles) if tiles else "default",
                        "ms": round(t * 1e3 / args.iters, 3),
                        "tops": round(flops / t / 1e12, 1)})
        print(json.dumps(records[-1]), flush=True)

    # XLA baselines
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)
    t = timed(lambda a, b: jnp.dot(a, b,
                                   preferred_element_type=jnp.float32),
              ab, bb)
    records.append({"kind": "xla_bf16",
                    "ms": round(t * 1e3 / args.iters, 3),
                    "tops": round(flops / t / 1e12, 1)})
    print(json.dumps(records[-1]), flush=True)
    t = timed(lambda a, b: jnp.dot(a, b,
                                   preferred_element_type=jnp.int32),
              a8, b8)
    records.append({"kind": "xla_int8",
                    "ms": round(t * 1e3 / args.iters, 3),
                    "tops": round(flops / t / 1e12, 1)})
    print(json.dumps(records[-1]), flush=True)

    with open(args.out, "a") as fh:
        for r in records:
            fh.write(json.dumps({"shape": [M, N, K], **r}) + "\n")


if __name__ == "__main__":
    main()
