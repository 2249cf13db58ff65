#!/usr/bin/env python
"""NFP kernel vs XLA-oracle timing on the real TPU at production shapes.

Shapes are the MobileNetV3 multi-stage taps (``texture_pooling.py:225-232``)
and ResNet intermediate taps that feed NFP at large maps. Appends one JSON
line per (shape, impl, fused) to ``--out``.

Timing: chained dependent scalar, fetched once (relay-safe; see bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPES = [
    # (label, B, H, W, C)
    ("mnv3_stage1", 16, 112, 112, 16),
    ("mnv3_stage2", 16, 56, 56, 24),
    ("mnv3_stage3", 16, 28, 28, 40),
    ("resnet_layer1", 16, 56, 56, 64),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", default="cosine")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--shapes", nargs="+", default=None,
                    help="subset of shape labels")
    ap.add_argument("--fuse_gap", choices=["on", "off", "both"],
                    default="both")
    ap.add_argument("--chw_body", choices=["auto", "fori", "vec"],
                    default="auto",
                    help="force a channels-first kernel body (large maps)")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "bench_nfp_kernel.jsonl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.ops.neighborhood import nfp_reference
    from neighbour_feature_pooling_tpu.ops.nfp_pallas import nfp_pallas
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def timed(fn, x):
        # s-chained launches so the relay cannot short-circuit; one fetch
        f = jax.jit(lambda xx, s: s + jnp.sum(fn(xx + s * 0)))
        s = jnp.zeros((), x.dtype)
        for _ in range(args.warmup):
            s = f(x, s)
        float(s)
        s = jnp.zeros((), x.dtype)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = f(x, s)
        float(s)
        return (time.perf_counter() - t0) / args.iters

    fuse_opts = {"on": [True], "off": [False],
                 "both": [True, False]}[args.fuse_gap]
    for label, b, h, w, c in SHAPES:
        if args.shapes and label not in args.shapes:
            continue
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        for fuse in fuse_opts:
            k = lambda xx: nfp_pallas(xx, 1, args.measure, padding=1,  # noqa: E731
                                      fuse_gap=fuse, chw_body=args.chw_body)
            o = lambda xx: nfp_reference(xx, 1, args.measure, padding=1,  # noqa: E731
                                         fuse_gap=fuse)
            # correctness first
            err = float(jnp.max(jnp.abs(k(x) - o(x))))
            tk = timed(k, x)
            to = timed(o, x)
            rec = {
                "shape": label, "B": b, "H": h, "W": w, "C": c,
                "measure": args.measure, "fuse_gap": fuse,
                "chw_body": args.chw_body,
                "pallas_ms": round(1e3 * tk, 3),
                "oracle_ms": round(1e3 * to, 3),
                "speedup": round(to / tk, 2),
                "max_err": err,
            }
            print(json.dumps(rec), flush=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
