#!/usr/bin/env python
"""Checkpoint save latency: blocking vs async (CPU only, no TPU claim).

``TrainerConfig.async_ckpt`` hides the filesystem write behind the next
epoch's compute: ``save_checkpoint(block=False)`` returns once device
shards are copied to host, and orbax's background thread does the write +
atomic commit-rename. This measures what the training loop actually
stalls on — the blocking save wall time vs the async call's return time
(the hidden remainder overlaps compute; ``wait`` reports it).

Run: ``python scripts/bench_ckpt.py [--model resnet50] [--iters 5]``
One JSON line per config, appended to ``bench_ckpt.jsonl`` at the root.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50",
                    choices=["resnet18", "resnet50", "mobilenetv3",
                             "vittiny"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "bench_ckpt.jsonl"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import create_train_state
    from neighbour_feature_pooling_tpu.train.checkpoint import (
        save_checkpoint, wait_for_saves)

    model = get_model(args.model, "texture_nfp", 21)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(
        rng.standard_normal((1, 64, 64, 3)).astype(np.float32))}
    state = create_train_state(model, jax.random.PRNGKey(0), batch, 1e-3)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(state)
                 if hasattr(x, "nbytes"))

    tmp = os.path.join(REPO, "checkpoints", "_bench_ckpt")
    shutil.rmtree(tmp, ignore_errors=True)
    path = os.path.join(tmp, "ck")

    def timed(fn):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # warmup (orbax lazy imports, directory creation)
    save_checkpoint(path, state, {"epoch": 0})

    t_block = timed(lambda: save_checkpoint(path, state, {"epoch": 0}))
    t_async = timed(
        lambda: save_checkpoint(path, state, {"epoch": 0}, block=False))
    # drain the save left in flight by the last async iteration: the
    # directly-measured hidden write time
    t0 = time.perf_counter()
    wait_for_saves()
    t_wait = time.perf_counter() - t0
    shutil.rmtree(tmp, ignore_errors=True)

    rec = {"model": args.model, "state_mb": round(nbytes / 2**20, 1),
           "save_block_s": round(t_block, 4),
           "save_async_return_s": round(t_async, 4),
           # directly measured drain of the in-flight write (first iter);
           # block - async is the same quantity derived differently
           "wait_s": round(t_wait, 4),
           "hidden_write_s": round(max(t_block - t_async, 0.0), 4)}
    print(json.dumps(rec))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
