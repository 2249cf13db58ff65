#!/usr/bin/env python
"""Train-step throughput measurement on the real TPU chip.

One configuration per invocation (keeps TPU compiles per process to 1, the
relay wedges on killed compiles). Appends one JSON line to ``--out``.

Modes:
* ``loop``  — the trainer's production path: one jitted optimizer step per
  host dispatch (state chains through donation, so steps serialize on
  device; the final loss fetch is the only host sync).
* ``scan``  — K optimizer steps per dispatch via ``lax.scan`` over
  ``train_step_body``: measures pure device throughput with host dispatch
  amortized K×. The gap between loop and scan is the per-dispatch overhead
  through the relay.

Examples:
  python scripts/bench_train.py --mode loop --batch 64
  python scripts/bench_train.py --mode scan --scan_steps 8 --batch 128 --bf16
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
    ap.add_argument("--mode", choices=["loop", "scan"], default="loop")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--input_bf16", action="store_true",
                    help="feed bf16 images (halves the host->device batch "
                         "buffer; the model casts to its compute dtype "
                         "anyway)")
    ap.add_argument("--stem_s2d", action="store_true",
                    help="ResNet space-to-depth stem conv (same arithmetic, "
                         "better MXU mapping)")
    ap.add_argument("--scan_steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30,
                    help="loop: optimizer steps; scan: dispatches "
                         "(each = scan_steps optimizer steps)")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--model_type", default="resnet18")
    ap.add_argument("--variant", default="texture_nfp")
    ap.add_argument("--num_classes", type=int, default=21)
    ap.add_argument("--out", default=os.path.join(REPO, "bench_train.jsonl"))
    ap.add_argument("--remat_conv_out", action="store_true",
                    help="remat with the save_only(conv_out) policy: BN/"
                         "ReLU intermediates recomputed from saved conv "
                         "outputs — a traffic-vs-FLOPs middle point for "
                         "the memory-bound step (ResNets)")
    ap.add_argument("--donate", action="store_true",
                    help="donate the train state into the jitted step "
                         "(in-place parameter/optimizer buffers)")
    ap.add_argument("--ab", default=None,
                    choices=["bf16", "remat", "stem_s2d", "input_bf16",
                             "remat_conv_out", "donate"],
                    help="interleaved A/B over one boolean flag: time the "
                         "flag OFF (A) vs ON (B) in alternating rounds "
                         "within ONE session and report paired ratios — "
                         "the protocol for any claimed win <=25%% "
                         "(run-to-run chip drift is about that size; "
                         "round-3 VERDICT weak #5b). Loop mode, 2 "
                         "compiles")
    ap.add_argument("--ab_rounds", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import (create_train_state,
                                                     make_train_step)
    from neighbour_feature_pooling_tpu.train.engine import train_step_body
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    def build(flags):
        dtype = jnp.bfloat16 if flags["bf16"] else jnp.float32
        model = get_model(args.model_type, args.variant, args.num_classes,
                          dtype=dtype,
                          remat=flags["remat"] or flags["remat_conv_out"],
                          remat_policy=("conv_out"
                                        if flags["remat_conv_out"]
                                        else "full"),
                          stem_s2d=flags["stem_s2d"])
        rng = np.random.default_rng(0)
        img_dtype = jnp.bfloat16 if flags["input_bf16"] else jnp.float32
        batch = {
            "image": jnp.asarray(
                rng.standard_normal((args.batch, args.img, args.img, 3))
                .astype(np.float32)).astype(img_dtype),
            "label": jnp.asarray(
                rng.integers(0, args.num_classes, args.batch), jnp.int32),
            "weight": jnp.ones((args.batch,), jnp.float32),
        }
        state = create_train_state(model, jax.random.PRNGKey(0), batch,
                                   1e-4)
        return model, batch, state

    base_flags = {"bf16": args.bf16, "remat": args.remat,
                  "stem_s2d": args.stem_s2d, "input_bf16": args.input_bf16,
                  "remat_conv_out": args.remat_conv_out,
                  "donate": args.donate}

    if args.ab:
        # donation is off by default for the A/B steps (each arm keeps its
        # own state); --ab donate measures donation itself, per-arm
        flags_b = dict(base_flags, **{args.ab: True})
        flags_a = dict(base_flags, **{args.ab: False})
        arms = []
        for flags in (flags_a, flags_b):
            model, batch, state = build(flags)
            # each arm owns its state and its program, so donating the
            # state is safe per-arm (the old buffer is consumed by the
            # same program that produced its successor)
            step = jax.jit(functools.partial(
                train_step_body, num_classes=args.num_classes),
                static_argnames=("frozen",),
                **({"donate_argnums": (0,)} if flags["donate"] else {}))
            drng = jax.random.PRNGKey(1)
            # ≥1 warmup is required in --ab mode: the compile must land
            # outside the timed rounds (and `loss` must be bound for the
            # sync below)
            for _ in range(max(1, args.warmup)):
                state, loss, _ = step(state, batch, drng, frozen=False)
            float(loss)
            arms.append({"flags": flags, "step": step, "state": state,
                         "batch": batch, "drng": drng})
        per_round = max(4, args.iters // args.ab_rounds)
        rates = [[], []]
        for _ in range(args.ab_rounds):
            for i, arm in enumerate(arms):
                st = arm["state"]
                t0 = time.perf_counter()
                for _ in range(per_round):
                    st, loss, _ = arm["step"](st, arm["batch"],
                                              arm["drng"], frozen=False)
                float(loss)
                arm["state"] = st
                rates[i].append(
                    args.batch * per_round / (time.perf_counter() - t0))
        ratios = [b / a for a, b in zip(rates[0], rates[1])]
        geomean = float(np.exp(np.mean(np.log(ratios))))
        rec = {
            "mode": "ab", "ab_flag": args.ab,
            "model": f"{args.model_type}+{args.variant}",
            "batch": args.batch, "img": args.img,
            "base_flags": base_flags, "rounds": args.ab_rounds,
            "iters_per_round": per_round,
            "rate_off_img_per_s": [round(r, 1) for r in rates[0]],
            "rate_on_img_per_s": [round(r, 1) for r in rates[1]],
            "paired_ratio_on_over_off": [round(r, 4) for r in ratios],
            "ratio_geomean": round(geomean, 4),
            "ratio_min": round(min(ratios), 4),
            "ratio_max": round(max(ratios), 4),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec))
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return

    model, batch, state = build(base_flags)
    drng = jax.random.PRNGKey(1)

    if args.mode == "loop":
        step = make_train_step(args.num_classes)
        for _ in range(args.warmup):
            state, loss, _ = step(state, batch, drng, frozen=False)
        float(loss)  # sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, loss, _ = step(state, batch, drng, frozen=False)
        final = float(loss)
        dt = time.perf_counter() - t0
        n_steps = args.iters
    else:
        body = functools.partial(train_step_body,
                                 num_classes=args.num_classes)

        @functools.partial(jax.jit, donate_argnames=("state",))
        def multi(state, batch, drng):
            def f(s, _):
                s2, loss, _cm = body(s, batch, drng, False)
                return s2, loss

            state, losses = jax.lax.scan(f, state, None,
                                         length=args.scan_steps)
            return state, losses[-1]

        for _ in range(args.warmup):
            state, loss = multi(state, batch, drng)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, loss = multi(state, batch, drng)
        final = float(loss)
        dt = time.perf_counter() - t0
        n_steps = args.iters * args.scan_steps

    img_per_s = args.batch * n_steps / dt
    rec = {
        "mode": args.mode,
        "model": f"{args.model_type}+{args.variant}",
        "batch": args.batch, "img": args.img,
        "dtype": "bf16" if args.bf16 else "fp32",
        "remat": args.remat,
        "remat_conv_out": args.remat_conv_out,
        "stem_s2d": args.stem_s2d,
        "scan_steps": args.scan_steps if args.mode == "scan" else 1,
        "steps": n_steps, "seconds": round(dt, 3),
        "img_per_s": round(img_per_s, 1),
        "ms_per_step": round(1000 * dt / n_steps, 2),
        "final_loss": round(final, 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
