#!/usr/bin/env python
"""Measure the fused stem-tail backward (ops/stem_pool.py) end-to-end.

ResNet18+texture_nfp train step (bf16 compute, B=128, s2d stem, scan-K
dispatch — the production flagship config) with ``stem_fused`` off vs on.
Round-2 profiling bounded the win at <=8% (SelectAndScatter + BN backward
over the 112^2 map); the merge bar is >=4% (VERDICT directive #5).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--variant", default="texture_nfp")
    ap.add_argument("--scan_steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "bench_stem_fused.jsonl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import create_train_state
    from neighbour_feature_pooling_tpu.train.engine import train_step_body
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((args.batch, args.img, args.img, 3))
            .astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 21, args.batch), jnp.int32),
        "weight": jnp.ones((args.batch,), jnp.float32),
    }
    drng = jax.random.PRNGKey(1)
    body = functools.partial(train_step_body, num_classes=21)
    results = {}

    for fused in (False, True):
        model = get_model("resnet18", args.variant, 21, dtype=jnp.bfloat16,
                          stem_s2d=True, stem_fused=fused)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, 1e-4)

        @functools.partial(jax.jit, donate_argnames=("state",))
        def step(state, batch, drng):
            def f(s, _):
                s2, loss, _cm = body(s, batch, drng, False)
                return s2, loss

            state, losses = jax.lax.scan(f, state, None,
                                         length=args.scan_steps)
            return state, losses[-1]

        for _ in range(args.warmup):
            state, loss = step(state, batch, drng)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, loss = step(state, batch, drng)
        final = float(loss)
        ms = ((time.perf_counter() - t0) / args.iters / args.scan_steps
              * 1e3)
        key = "stem_fused" if fused else "baseline"
        results[key] = round(ms, 3)
        print(f"{key}: {ms:.2f} ms/step ({args.batch / ms * 1e3:.0f} img/s)"
              f" loss={final:.3f}")

    speedup = results["baseline"] / results["stem_fused"]
    rec = {"batch": args.batch, "img": args.img, "variant": args.variant,
           "scan_steps": args.scan_steps, "ms_per_step": results,
           "speedup": round(speedup, 4)}
    print(json.dumps(rec))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
