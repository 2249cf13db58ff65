"""Smoke-run bench.py's device measure functions on the CPU backend.

The driver executes ``bench.py`` unattended on the real chip at the end of
every round; a silent import/API drift there would lose the round's
benchmark.  These tests run each measure function end-to-end at tiny sizes
(monkeypatched image size / batch) so any breakage in the model registry,
train-state, or Predictor surfaces here first.  Numbers produced on CPU are
meaningless and are only checked for being finite and positive.
"""

import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as b

    # 64px keeps the CPU compile in seconds; the TPU run keeps 224.
    monkeypatch.setattr(b, "IMG", 64)
    return b


def test_measure_tpu_fp32_smoke(bench):
    v = bench.measure_tpu(batch=2, iters=2, warmup=1)
    assert v > 0


def test_measure_tpu_bf16_smoke(bench):
    # the bf16 forward metric added in round 3 (record["fwd_img_per_s_bf16"])
    v = bench.measure_tpu(batch=2, iters=2, warmup=1, bf16=True)
    assert v > 0


def test_measure_tpu_train_smoke(bench):
    v = bench.measure_tpu_train(batch=2, k=2, iters=1, warmup=1)
    assert v > 0


def test_measure_serve_int8_smoke(bench):
    # opt-in metric (NFP_TPU_BENCH_INT8=1) — still must not rot
    v = bench.measure_tpu_serve_int8(batch=2, iters=1, warmup=1)
    assert v > 0
