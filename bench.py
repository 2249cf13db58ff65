#!/usr/bin/env python
"""Headline benchmark: ResNet18+NFP(cosine) forward images/sec/chip @224px.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

``vs_baseline`` is measured against the PyTorch CPU reference pipeline
(BASELINE.json north star: >=10x). The torch baseline — a standard torch
ResNet18 feature extractor + the reference's own NFPPooling op imported from
/root/reference + the nfp_pooling fusion head — exists in TWO forms
(round-3 VERDICT weak #5a: the local re-measure on a contended shared core
swung 13.3-19.8 img/s across rounds, moving the headline ratio 1,207-1,711x
while the device numerator moved <5%):

* **canonical** (``bench_baseline_canonical.json``, COMMITTED, dated): the
  denominator of the headline ``vs_baseline`` — stable across rounds.
* **local** (``bench_baseline.json``, gitignored cache): measured once per
  machine; reported as ``vs_baseline_local``/``baseline_local_img_per_s``.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")
CANONICAL_BASELINE = os.path.join(REPO, "bench_baseline_canonical.json")
BATCH = 128
IMG = 224


def measure_tpu(batch=BATCH, iters=30, warmup=5, bf16=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # stem_s2d: space-to-depth stem conv — numerically equivalent (same
    # multiply-add set, tests/test_models.py::test_stem_s2d_equivalence),
    # measured faster on v5e (PARITY.md)
    model = get_model("resnet18", "texture_nfp", 21, stem_s2d=True,
                      **({"dtype": jnp.bfloat16} if bf16 else {}))
    rng = np.random.default_rng(0)
    # two distinct device-resident inputs, alternated so no caching layer in
    # the experimental tunnel backend can short-circuit repeated calls
    xs = [jnp.asarray(rng.standard_normal((batch, IMG, IMG, 3))
                      .astype(np.float32)) for _ in range(2)]
    variables = model.init({"params": jax.random.PRNGKey(0)}, xs[0][:1],
                           train=False)
    # Chain every iteration into one dependent scalar and fetch it once:
    # through the axon relay, block_until_ready() returns early and a
    # per-iteration float() costs a ~20ms round trip, so the only honest
    # timing is a data-dependent chain ended by a single 4-byte fetch.
    fwd = jax.jit(lambda v, xx, s: s + jnp.sum(model.apply(v, xx,
                                                           train=False)))
    s = jnp.zeros(())
    for i in range(warmup):
        s = fwd(variables, xs[i % 2], s)
    float(s)
    s = jnp.zeros(())
    t0 = time.perf_counter()
    for i in range(iters):
        s = fwd(variables, xs[i % 2], s)
    float(s)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def measure_chip_probe(n=4096, iters=100, k=4):
    """Fixed-shape bf16 matmul TFLOPS probe — a chip-state indicator
    emitted alongside the headline (round-4 VERDICT #4: run-to-run chip/
    relay drift is ±25%, so cross-round img/s deltas need a normalizer).
    The probe is a pure (n,n)@(n,n) bf16 chain whose speed depends only
    on MXU clock + relay health, never on framework code — a LOW probe
    marks the round's numerator as drift-suppressed, a HIGH one as
    drift-inflated. v5e bf16 peak is ~197 TFLOPS; a healthy relay
    session measures ~175 at this size (2026-08-20)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    scale = jnp.bfloat16(1.0 / np.sqrt(n))  # keep magnitudes finite

    @jax.jit
    def run(y, b):
        def body(i, y):
            return (y @ b) * scale

        return jax.lax.fori_loop(0, iters, body, y)

    y = run(a, b)  # compile + warm
    float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    y = a
    for _ in range(k):  # chained dispatches, one 4-byte fetch at the end
        y = run(y, b)
    float(jnp.sum(y.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return 2 * n ** 3 * iters * k / dt / 1e12


def measure_tpu_train(batch=128, k=4, iters=8, warmup=2):
    """Train-step throughput (fwd+bwd+Adam) for the flagship config in the
    RECOMMENDED production setup (bf16 compute / fp32 master + Adam, B=128,
    steps_per_dispatch=4 — see PARITY.md training table). Each dispatch
    scans K optimizer steps over K distinct device-resident batches, the
    trainer's multi-step production path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import create_train_state
    from neighbour_feature_pooling_tpu.train.engine import make_multi_train_step

    model = get_model("resnet18", "texture_nfp", 21, dtype=jnp.bfloat16,
                      stem_s2d=True)
    rng = np.random.default_rng(0)
    # transfer K separate batches then stack ON DEVICE — exactly what the
    # trainer's steps_per_dispatch path does, and it keeps each host->
    # device transfer at one batch (~77 MB); a single stacked host array
    # would push a >300 MB buffer through the relay (CLAUDE.md: >100 MB
    # device buffers can hang it)
    batches = [{
        "image": jnp.asarray(rng.standard_normal((batch, IMG, IMG, 3))
                             .astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 21, batch), jnp.int32),
        "weight": jnp.ones((batch,), jnp.float32),
    } for _ in range(k)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    first = batches[0]
    state = create_train_state(model, jax.random.PRNGKey(0), first, 1e-4)
    multi = make_multi_train_step(21, k)
    drng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, losses, _ = multi(state, stacked, drng, frozen=False)
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses, _ = multi(state, stacked, drng, frozen=False)
    float(losses[-1])
    return batch * k * iters / (time.perf_counter() - t0)


def measure_tpu_serve_int8(batch=BATCH, iters=20, warmup=3):
    """int8 serving device rate (XLA s8 route: dot-lowered 1×1 convs,
    prequantized weights, BN folding, dynamic activation scales — ONE
    compile; the calibrated + chained tier is measured by
    scripts/bench_serve.py --int8 --calibrate)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.serve import Predictor

    pred = Predictor("resnet18", "texture_nfp", 21, batch_size=batch,
                     input_size=IMG, quantize="int8")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, IMG, IMG, 3)).astype(np.float32)
    xd = jnp.asarray(x)
    f = pred._forward
    chain = jax.jit(lambda v, xx, ss: ss + jnp.sum(f(v, xx + ss * 0)))
    s = jnp.zeros(())
    for _ in range(warmup):
        s = chain(pred._serve_variables, xd, s)
    float(s)
    s = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        s = chain(pred._serve_variables, xd, s)
    float(s)
    return batch * iters / (time.perf_counter() - t0)


def measure_torch_cpu_baseline(batch=32, iters=5, warmup=2):
    """PyTorch CPU reference: standard ResNet18 features + the reference's
    NFPPooling (imported read-only from /root/reference) + fusion head."""
    import numpy as np
    import torch
    import torch.nn as nn

    sys.path.insert(0, "/root/reference")
    from models.pooling.nfp import NFPPooling  # reference op, at runtime

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class ResNet18Features(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
                nn.ReLU(), nn.MaxPool2d(3, 2, 1))
            layers = []
            cin = 64
            for cout, stride in ((64, 1), (128, 2), (256, 2), (512, 2)):
                layers += [BasicBlock(cin, cout, stride),
                           BasicBlock(cout, cout)]
                cin = cout
            self.layers = nn.Sequential(*layers)

        def forward(self, x):
            return self.layers(self.stem(x))

    class RefModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = ResNet18Features()
            self.nfp = NFPPooling(in_channels=512, R=1, measure="cosine",
                                  padding=1)
            self.nfp_proj = nn.Linear(8, 512)
            self.fc = nn.Linear(512, 21)

        def forward(self, x):
            f = self.backbone(x)
            x_avg = torch.nn.functional.adaptive_avg_pool2d(f, 1).flatten(1)
            m = self.nfp(f)
            v = torch.nn.functional.adaptive_avg_pool2d(m, 1).flatten(1)
            return self.fc(x_avg * self.nfp_proj(v))

    model = RefModel().eval()
    x = torch.from_numpy(np.random.default_rng(0)
                         .standard_normal((batch, 3, IMG, IMG))
                         .astype(np.float32))
    with torch.no_grad():
        for _ in range(warmup):
            model(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


def get_baseline():
    """Returns (img_per_s, estimated) — ``estimated=True`` marks the
    conservative fallback used when the torch baseline cannot be measured
    and no cached measurement exists."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_img_per_s"], False
    try:
        v = measure_torch_cpu_baseline()
    except Exception as e:
        print(f"# baseline measurement failed ({e}); using recorded value",
              file=sys.stderr)
        # conservative torch-CPU estimate for this machine class
        return 25.0, True
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_img_per_s": v,
                   "config": "ResNet18+NFP(cosine) fwd, 224px, torch CPU"},
                  f)
    return v, False


def get_canonical_baseline():
    """The committed, dated torch-CPU baseline (round-comparable
    denominator); falls back to the local measurement when the file is
    missing (e.g. a stripped checkout)."""
    try:
        with open(CANONICAL_BASELINE) as f:
            return float(json.load(f)["torch_cpu_img_per_s"])
    except (OSError, KeyError, ValueError):
        return None


def main():
    value = measure_tpu()
    local, estimated = get_baseline()
    canonical = get_canonical_baseline()
    record = {
        "metric": "images/sec/chip (ResNet18+NFP fwd, 224px)",
        "value": round(value, 1),
        "unit": "img/s",
        "vs_baseline": round(value / (canonical or local), 2),
        "vs_baseline_local": round(value / local, 2),
        "baseline_local_img_per_s": round(local, 2),
    }
    if canonical is None:
        record["baseline_canonical_missing"] = True
    if estimated:
        record["baseline_estimated"] = True
    try:
        # chip-state normalizer: framework-independent bf16 matmul TFLOPS
        # (see measure_chip_probe docstring; read img/s deltas across
        # rounds relative to this)
        record["chip_probe_tflops"] = round(measure_chip_probe(), 1)
        record["probe_ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())
    except Exception as e:
        print(f"# chip probe failed: {e}", file=sys.stderr)
    try:
        record["train_img_per_s_bf16"] = round(measure_tpu_train(), 1)
    except Exception as e:  # the headline metric must survive regardless
        print(f"# train measurement failed: {e}", file=sys.stderr)
    try:
        # the serving recommendation is bf16 (PARITY.md) — report its
        # forward rate alongside the fp32 headline (kept fp32 for
        # round-to-round comparability)
        record["fwd_img_per_s_bf16"] = round(measure_tpu(bf16=True), 1)
    except Exception as e:
        print(f"# bf16 fwd measurement failed: {e}", file=sys.stderr)
    # Opt-in: the XLA-route dynamic int8 tier measured 0.94× bf16
    # (18.5k vs 19.6k img/s, 2026-08-18; the calibrated tier is at
    # parity) — close enough to the bf16 headline that it isn't worth
    # an extra relay compile per bench run; scripts/bench_serve.py
    # covers the serving tiers properly.
    if os.environ.get("NFP_TPU_BENCH_INT8", "0") == "1":
        try:
            record["serve_int8_img_per_s"] = round(
                measure_tpu_serve_int8(), 1)
        except Exception as e:  # optional metric — never break the line
            print(f"# int8 serve measurement failed: {e}", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
