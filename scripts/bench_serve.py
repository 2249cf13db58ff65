#!/usr/bin/env python
"""Serving-path benchmark: ``serve.Predictor`` latency/throughput on TPU.

Measures the real request path (``predict`` with preprocessed inputs: pad →
device_put → compiled forward → fetch probabilities, one host sync per
call) and the pure device rate (chained forwards, one fetch). Through the
axon relay each call pays a ~20 ms round trip that a colocated server would
not; both numbers are recorded. Appends one JSON line per config to
``--out``.
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
    ap.add_argument("--model_type", default="resnet18")
    ap.add_argument("--variant", default="texture_nfp")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="post-training int8 path (quant.py): s8*s8->s32, "
                         "XLA s8 dot_general route; best tiers measured "
                         "at-or-above bf16 per family (PARITY.md)")
    ap.add_argument("--calibrate", action="store_true",
                    help="int8 only: static activation calibration + "
                         "verified conv->conv s8 chaining before timing")
    ap.add_argument("--mixed", action="store_true",
                    help="int8 only: mixed tier — dense/1x1 convs int8, "
                         "spatial convs bf16 (implies bf16 model dtype)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--ab", default=None, metavar="TIER_A,TIER_B",
                    help="interleaved A/B: alternate two serving tiers "
                         "(fp32|bf16|int8|int8_mixed[,_calib]) within ONE "
                         "session and report PAIRED device-rate ratios — "
                         "the protocol for any claimed win <=25%%, since "
                         "chip state drifts run-to-run by about that much "
                         "(round-3 VERDICT weak #5b). Two compiles, one "
                         "process")
    ap.add_argument("--ab_rounds", type=int, default=5,
                    help="paired measurement rounds for --ab")
    ap.add_argument("--out", default=os.path.join(REPO, "bench_serve.jsonl"))
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on the CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.serve import Predictor
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    def build_predictor(tier: str):
        """One serving tier by name: fp32 | bf16 | int8[|_mixed][_calib]."""
        base = tier.replace("_calib", "")
        if base not in ("fp32", "bf16", "int8", "int8_mixed"):
            raise SystemExit(f"unknown tier {tier!r}")
        int8 = base.startswith("int8")
        mixed = base == "int8_mixed"
        kw = {"dtype": jnp.bfloat16} if (base == "bf16" or mixed) else {}
        p = Predictor(args.model_type, args.variant, 21,
                      batch_size=args.batch, input_size=args.img,
                      model_kwargs=kw,
                      quantize="int8" if int8 else None,
                      quantize_spatial=not mixed)
        if tier.endswith("_calib"):
            p.calibrate(x, preprocessed=True)
        return p

    def device_rate(pred, chain, iters):
        """Chained compiled forwards, one 4-byte fetch (relay-honest)."""
        s = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(iters):
            s = chain(pred._serve_variables, xd, s)
        float(s)
        return args.batch * iters / (time.perf_counter() - t0)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        (args.batch, args.img, args.img, 3)).astype(np.float32)
    xd = jnp.asarray(x)

    if args.ab:
        tiers = [t.strip() for t in args.ab.split(",")]
        if len(tiers) != 2:
            raise SystemExit("--ab takes exactly two comma-separated tiers")
        preds, chains = [], []
        for t in tiers:
            p = build_predictor(t)
            f = p._forward
            chain = jax.jit(
                lambda v, xx, ss, f=f: ss + jnp.sum(f(v, xx + ss * 0)))
            # warm both programs before ANY timing (compiles out of band)
            s = jnp.zeros(())
            for _ in range(args.warmup):
                s = chain(p._serve_variables, xd, s)
            float(s)
            preds.append(p)
            chains.append(chain)
        per_round = max(4, args.iters // args.ab_rounds)
        rates = [[], []]
        for _ in range(args.ab_rounds):
            for i in (0, 1):   # A,B adjacent within each round: chip
                rates[i].append(device_rate(preds[i], chains[i], per_round))
        ratios = [b / a for a, b in zip(rates[0], rates[1])]
        geomean = float(np.exp(np.mean(np.log(ratios))))
        rec = {
            "model": f"{args.model_type}+{args.variant}",
            "batch": args.batch, "img": args.img,
            "ab": tiers, "rounds": args.ab_rounds,
            "iters_per_round": per_round,
            "rate_a_img_per_s": [round(r, 1) for r in rates[0]],
            "rate_b_img_per_s": [round(r, 1) for r in rates[1]],
            "paired_ratio_b_over_a": [round(r, 4) for r in ratios],
            "ratio_geomean": round(geomean, 4),
            "ratio_min": round(min(ratios), 4),
            "ratio_max": round(max(ratios), 4),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec))
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        return

    kwargs = {"dtype": jnp.bfloat16} if args.bf16 else {}
    if args.mixed:
        if not args.int8:
            raise SystemExit("--mixed requires --int8")
        kwargs = {"dtype": jnp.bfloat16}
    pred = Predictor(args.model_type, args.variant, 21,
                     batch_size=args.batch, input_size=args.img,
                     model_kwargs=kwargs,
                     quantize="int8" if args.int8 else None,
                     quantize_spatial=not args.mixed)
    n_chains = 0
    if args.calibrate:
        if not args.int8:
            raise SystemExit("--calibrate requires --int8")
        n = pred.calibrate(x, preprocessed=True)
        n_chains = len(pred._int8_chains or {})
        print(json.dumps({"calibrated_layers": n,
                          "int8_chains": n_chains}), flush=True)

    # request-path latency: one predict() call = one host sync
    for _ in range(args.warmup):
        pred.predict(x, preprocessed=True)
    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = pred.predict(x, preprocessed=True)
        lat.append(time.perf_counter() - t0)
    lat_ms = sorted(1e3 * t for t in lat)
    p50 = lat_ms[len(lat_ms) // 2]
    p95 = lat_ms[int(len(lat_ms) * 0.95)]

    # pure device rate: chained compiled forwards, one 4-byte fetch
    xd = jnp.asarray(x)
    f = pred._forward
    s = jnp.zeros(())
    chain = jax.jit(lambda v, xx, ss: ss + jnp.sum(f(v, xx + ss * 0)))
    for _ in range(args.warmup):
        s = chain(pred._serve_variables, xd, s)
    float(s)
    s = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s = chain(pred._serve_variables, xd, s)
    float(s)
    dev_rate = args.batch * args.iters / (time.perf_counter() - t0)

    rec = {
        "model": f"{args.model_type}+{args.variant}",
        "batch": args.batch, "img": args.img,
        "dtype": (("int8_mixed" if args.mixed else "int8")
                  + ("_calib" if args.calibrate else "")
                  if args.int8 else
                  "bf16" if args.bf16 else "fp32"),
        "int8_chains": n_chains,
        "predict_p50_ms": round(p50, 2),
        "predict_p95_ms": round(p95, 2),
        "predict_img_per_s": round(args.batch / (p50 / 1e3), 1),
        "device_img_per_s": round(dev_rate, 1),
        "backend": jax.default_backend(),
        "probs_shape": list(out["probabilities"].shape),
    }
    print(json.dumps(rec))
    with open(args.out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
