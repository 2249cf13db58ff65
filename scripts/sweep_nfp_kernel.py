#!/usr/bin/env python
"""NFP kernel robustness sweep on the real TPU.

Round-1 hardware validation concentrated on R=1 head shapes; this sweep
exercises the corners — R=2 (24 neighbors), dilation=2, bf16 inputs, odd
widths, both kernel bodies (unrolled ≤256 positions, channels-first above) —
and records the worst |kernel − oracle| per configuration. Appends JSON
lines to ``--out``; the summary lands in PARITY.md.

Compile count: one kernel + one oracle per config (~10 configs). Run it
when the chip is otherwise idle; never timeout-kill it mid-compile.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (label, shape BHWC, radius, dilation, padding, dtype, measure, fuse_gap)
CONFIGS = [
    ("r2_head", (4, 9, 9, 32), 2, 1, 2, "float32", "cosine", False),
    ("r2_large", (2, 40, 40, 16), 2, 1, 2, "float32", "cosine", False),
    ("dilation2", (2, 15, 15, 24), 1, 2, 2, "float32", "cosine", False),
    ("dilation2_large", (2, 40, 40, 16), 1, 2, 2, "float32", "rmse", False),
    ("bf16_head", (4, 7, 7, 64), 1, 1, 1, "bfloat16", "cosine", False),
    ("bf16_large", (2, 56, 56, 24), 1, 1, 1, "bfloat16", "cosine", False),
    ("odd_w", (2, 13, 11, 24), 1, 1, 1, "float32", "cosine", False),
    ("odd_w_large", (2, 33, 29, 16), 1, 1, 1, "float32", "norm", False),
    ("gap_r2", (2, 40, 40, 16), 2, 1, 2, "float32", "cosine", True),
    ("gap_bf16", (2, 56, 56, 24), 1, 1, 1, "bfloat16", "cosine", True),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "sweep_nfp_kernel.jsonl"))
    ap.add_argument("--configs", nargs="+", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.ops.neighborhood import nfp_reference
    from neighbour_feature_pooling_tpu.ops.nfp_pallas import nfp_pallas
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    worst = 0.0
    for (label, shape, r, dil, pad, dtype, measure, fuse) in CONFIGS:
        if args.configs and label not in args.configs:
            continue
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(
            dtype)
        got = np.asarray(nfp_pallas(x, r, measure, padding=pad, dilation=dil,
                                    fuse_gap=fuse), np.float32)
        want = np.asarray(nfp_reference(x, r, measure, padding=pad,
                                        dilation=dil, fuse_gap=fuse),
                          np.float32)
        err = float(np.max(np.abs(got - want)))
        denom = float(np.max(np.abs(want))) or 1.0
        rec = {"config": label, "shape": shape, "radius": r,
               "dilation": dil, "padding": pad, "dtype": dtype,
               "measure": measure, "fuse_gap": fuse,
               "max_abs_err": err, "max_rel_err": err / denom,
               "backend": jax.default_backend()}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        worst = max(worst, err / denom)
    print(f"# worst relative error over sweep: {worst:.2e}")


if __name__ == "__main__":
    main()
