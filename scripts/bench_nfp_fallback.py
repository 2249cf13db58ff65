#!/usr/bin/env python
"""Measure the NFP oracle-fallback configs against the Pallas kernel.

``ops.nfp`` dispatches to the fused Pallas kernel only for stride-1,
stat-free measures (``nfp_pallas.pallas_supported``); ``stride > 1`` and
``mahalanobis`` (a diagonal-covariance extension the reference lists but
never implemented, ``/root/reference/models/pooling/nfp.py:74,120``) take
the XLA shifted-slice oracle. This script puts numbers on that fallback
(round-3 VERDICT #8): at each shape it times

* ``kernel_s1``  — the Pallas kernel at stride 1 (the covered fast path),
* ``oracle_s1``  — the oracle at the same config (the kernel's margin),
* ``oracle_s2``  — the oracle at stride 2 (fallback; 4x smaller output),
* ``oracle_mahal`` — the oracle running mahalanobis at stride 1.

Timing is relay-honest (iterations chained into one dependent scalar, a
single 4-byte fetch). One process = one shape = 4 compiles; the shell
wrapper serializes shapes. Appends JSON lines to ``--out``.

Usage::

    python scripts/bench_nfp_fallback.py --shape 128x7x7x512
    python scripts/bench_nfp_fallback.py --shape 128x14x14x192 --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="128x7x7x512",
                    help="BxHxWxC feature-map shape")
    ap.add_argument("--measure", default="cosine",
                    help="measure for the stride arms")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "bench_nfp_fallback.jsonl"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.ops import nfp, nfp_reference
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    b, h, w, c = (int(v) for v in args.shape.split("x"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))

    def timed(fn):
        chain = jax.jit(lambda xx, ss: ss + jnp.sum(fn(xx + ss * 0)))
        s = jnp.zeros(())
        for _ in range(args.warmup):
            s = chain(x, s)
        float(s)
        s = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = chain(x, s)
        float(s)
        return (time.perf_counter() - t0) / args.iters * 1e3  # ms

    m = args.measure
    arms = {
        # ops.nfp dispatches: kernel for (stride=1, stat-free), oracle else
        "kernel_s1_ms": lambda xx: nfp(xx, 1, m, padding=1),
        "oracle_s1_ms": lambda xx: nfp_reference(xx, 1, m, padding=1),
        "oracle_s2_ms": lambda xx: nfp(xx, 1, m, padding=1, stride=2),
        "oracle_mahal_ms": lambda xx: nfp(xx, 1, "mahalanobis", padding=1),
    }
    rec = {"shape": args.shape, "measure": m,
           "backend": jax.default_backend(), "iters": args.iters}
    for name, fn in arms.items():
        rec[name] = round(timed(fn), 3)
    rec["oracle_margin_s1"] = round(
        rec["oracle_s1_ms"] / rec["kernel_s1_ms"], 3)
    rec["fallback_vs_kernel_s2"] = round(
        rec["oracle_s2_ms"] / rec["kernel_s1_ms"], 3)
    print(json.dumps(rec))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
