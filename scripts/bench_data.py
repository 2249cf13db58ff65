#!/usr/bin/env python
"""Host input-pipeline throughput (CPU only, no TPU claim).

Measures images/sec through the decode→augment→batch path for both the
python/PIL oracle and the fused C++ kernel (``native/augment.cpp``), at the
training resolution. The pipeline must outrun the device's train step
(PARITY.md: 8.7k img/s at bf16 B=128 on one v5e chip) or data becomes the
bottleneck — this records the margin.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_samples", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--src", type=int, default=256, help="source image px")
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--threads", type=int, default=0,
                    help="native augment threads (0 = all cores)")
    ap.add_argument("--out", default=os.path.join(REPO, "bench_data.jsonl"))
    args = ap.parse_args()

    import numpy as np

    from neighbour_feature_pooling_tpu.data.datamodules import (
        SyntheticDataModule)

    results = {}
    for native in (False, True):
        dm = SyntheticDataModule(
            num_classes=4, num_samples=args.num_samples,
            image_size=args.src, batch_size=args.batch)
        dm.transform = type(dm.transform)(
            resize_size=args.src + 32, input_size=args.input_size,
            mean=dm.transform.mean, std=dm.transform.std)
        dm.use_native = native
        dm.num_workers = args.threads
        dm.prepare_data()
        dm.setup("fit")
        if native and not dm._native_enabled():
            print("# native kernel unavailable; skipping", file=sys.stderr)
            continue
        # warm (decode caches, thread pools)
        n = sum(b["image"].shape[0] for b in dm.train_batches(0))
        t0 = time.perf_counter()
        n = 0
        for b in dm.train_batches(1):
            n += int(b["weight"].sum())
        dt = time.perf_counter() - t0
        key = "native_cpp" if native else "python_pil"
        results[key] = round(n / dt, 1)
        print(f"{key}: {n / dt:.0f} img/s ({n} imgs in {dt:.2f}s)")

    rec = {"pipeline_img_per_s": results, "batch": args.batch,
           "src_px": args.src, "input_size": args.input_size,
           "threads": args.threads or os.cpu_count()}
    print(json.dumps(rec))
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
