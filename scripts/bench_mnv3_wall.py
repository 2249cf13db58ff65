#!/usr/bin/env python
"""MobileNetV3 memory-wall diagnosis (round-2 VERDICT directive #4).

The bf16 B=128 train step measured 16.0 ms (~2.7% MFU) in round 2 with a
profile showing "a flat spread of BN-stat reductions". Before building a
fused inverted-residual Pallas kernel, bound what each candidate fusion
could possibly save, on hardware:

* ``full``        — the production train step (train=True BN: batch stats
                    computed + running stats updated). Baseline.
* ``no_bn_stats`` — gradients through eval-mode BN (running stats only):
                    every batch-stat reduction AND its backward terms
                    vanish. The gap to ``full`` is the *ceiling* for any
                    BN-stat fusion (a real fused kernel keeps the math and
                    can only recover the extra HBM passes).
* ``fwd_only``    — forward pass train=True (no grad): locates how much of
                    the step is backward.

Timings use the scan-chained single-fetch pattern (relay-safe; see
``bench.py::measure_tpu``).
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
                                                  "bench_mnv3_wall.jsonl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import create_train_state
    from neighbour_feature_pooling_tpu.train.engine import (
        cross_entropy_loss, train_step_body)
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    model = get_model("mobilenetv3", args.variant, 31, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((args.batch, args.img, args.img, 3))
            .astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 31, args.batch), jnp.int32),
        "weight": jnp.ones((args.batch,), jnp.float32),
    }
    state = create_train_state(model, jax.random.PRNGKey(0), batch, 1e-4)
    drng = jax.random.PRNGKey(1)

    body = functools.partial(train_step_body, num_classes=31)

    @functools.partial(jax.jit, donate_argnames=("state",))
    def full(state, batch, drng):
        def f(s, _):
            s2, loss, _cm = body(s, batch, drng, False)
            return s2, loss

        state, losses = jax.lax.scan(f, state, None, length=args.scan_steps)
        return state, losses[-1]

    @jax.jit
    def no_bn_stats(params, opt_state, batch_stats, batch):
        # eval-mode BN under grad: batch-stat reductions and their backward
        # terms disappear; Adam update kept so the step shape matches
        def one(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                logits = state.apply_fn(
                    {"params": p, "batch_stats": batch_stats},
                    batch["image"], train=False)
                return cross_entropy_loss(logits, batch["label"],
                                          batch["weight"])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = state.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), None, length=args.scan_steps)
        return params, opt_state, losses[-1]

    @jax.jit
    def fwd_only(params, batch_stats, batch):
        def one(s, _):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": batch_stats},
                batch["image"], train=True, rngs={"dropout": drng},
                mutable=["batch_stats"])
            return s + jnp.sum(logits.astype(jnp.float32)), None

        s, _ = jax.lax.scan(one, jnp.zeros(()), None,
                            length=args.scan_steps)
        return s

    results = {}

    def record(name, ms):
        per_step = ms / args.scan_steps
        results[name] = round(per_step, 3)
        print(f"{name}: {per_step:.2f} ms/step "
              f"({args.batch / per_step * 1e3:.0f} img/s)")

    # --- full ---
    st = state
    for _ in range(args.warmup):
        st, loss = full(st, batch, drng)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        st, loss = full(st, batch, drng)
    float(loss)
    record("full", (time.perf_counter() - t0) / args.iters * 1e3)

    # --- no_bn_stats --- (state was donated into `full`; use its output)
    params, opt_state = st.params, st.opt_state
    for _ in range(args.warmup):
        params, opt_state, loss = no_bn_stats(params, opt_state,
                                              st.batch_stats, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, loss = no_bn_stats(params, opt_state,
                                              st.batch_stats, batch)
    float(loss)
    record("no_bn_stats", (time.perf_counter() - t0) / args.iters * 1e3)

    # --- fwd_only ---
    s = fwd_only(params, st.batch_stats, batch)
    float(s)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s = fwd_only(params, st.batch_stats, batch)
    float(s)
    record("fwd_only", (time.perf_counter() - t0) / args.iters * 1e3)

    rec = {"batch": args.batch, "img": args.img, "variant": args.variant,
           "scan_steps": args.scan_steps, "ms_per_step": results,
           "bn_stat_ceiling_ms": round(results["full"]
                                       - results["no_bn_stats"], 3)}
    print(json.dumps(rec))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
