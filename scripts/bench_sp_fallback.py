#!/usr/bin/env python
"""Measure the spatially-sharded NFP fallback cliff (round-4 VERDICT #5).

The NFP op's ``custom_partitioning`` rule H-shards "same"-geometry configs
(stride 1, padding = R·d) with a 2-``ppermute`` halo exchange; ineligible
configs (stride > 1, padding != R·d, uneven shards, shards not taller than
the halo) fall back to resharding the input to batch-only — on a B=1
megapixel map that is a full-H all-gather plus every chip computing the
whole map. This script quantifies that cliff on the virtual 8-device CPU
mesh: wall time + all-gather count in the optimized HLO for an eligible
config vs the two ineligible ones, same tensor.

Production heads are all eligible (padding=R, stride=1 — ops/nfp_pallas.py
``_partitioned_forward``); the cliff only applies to library users calling
``nfp`` with exotic geometry on an H-sharded map.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
           python scripts/bench_sp_fallback.py [--h 1024 --w 1024 --c 16]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "bench_sp_fallback.jsonl"))
    args = ap.parse_args()

    # this is a virtual-mesh measurement by construction: force the CPU
    # backend (env vars alone don't override the axon sitecustomize —
    # CLAUDE.md) and fan out virtual devices if the flag wasn't set
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_"
                                     "count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neighbour_feature_pooling_tpu.ops import nfp

    n = jax.device_count()
    mesh = Mesh(np.array(jax.devices()), ("sp",))
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((1, args.h, args.w, args.c))
                    .astype(np.float32)), sh)

    configs = {
        # eligible: stride 1, padding = R -> halo path, stays H-sharded
        "eligible_same": dict(radius=1, measure="cosine", padding=1,
                              stride=1),
        # ineligible: stride 2 -> reshard to batch-only (full-H gather)
        "fallback_stride2": dict(radius=1, measure="cosine", padding=1,
                                 stride=2),
        # ineligible: padding != R*d
        "fallback_pad0": dict(radius=1, measure="cosine", padding=0,
                              stride=1),
    }

    recs = []
    for name, kw in configs.items():
        fn = jax.jit(lambda x, kw=kw: nfp(x, **kw))
        lowered = fn.lower(x)
        hlo = lowered.compile().as_text()
        n_ag = hlo.count("all-gather")
        n_cp = hlo.count("collective-permute")
        out = fn(x)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x)
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / args.iters * 1000
        # bytes a chip holds for the op input under this path
        shard_mb = x.nbytes / 1e6 / (1 if n_ag else n)
        rec = {"config": name, "h": args.h, "w": args.w, "c": args.c,
               "devices": n, "all_gathers": n_ag,
               "collective_permutes": n_cp,
               "ms_per_call": round(ms, 1),
               "input_mb_per_chip": round(shard_mb, 1),
               "out_shape": list(out.shape),
               "backend": jax.default_backend()}
        recs.append(rec)
        print(json.dumps(rec))

    base = next(r for r in recs if r["config"] == "eligible_same")
    for r in recs[1:]:
        print(f"# {r['config']}: {r['ms_per_call'] / base['ms_per_call']:.2f}x"
              f" the eligible config's wall time, "
              f"{r['all_gathers']} all-gather(s) vs {base['all_gathers']}")
    with open(args.out, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
