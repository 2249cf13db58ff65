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


def test_bench_serve_ab_mode(tmp_path):
    """Interleaved A/B serving benchmark (round-3 VERDICT weak #5b): two
    tiers alternate in one session and the record carries paired ratios."""
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench_serve", "/root/repo/scripts/bench_serve.py")
    bs = importlib.util.module_from_spec(spec)
    out = tmp_path / "ab.jsonl"
    argv = sys.argv
    sys.argv = ["bench_serve", "--cpu", "--ab", "fp32,bf16", "--batch", "2",
                "--img", "32", "--iters", "4", "--ab_rounds", "2",
                "--warmup", "1", "--out", str(out)]
    try:
        spec.loader.exec_module(bs)
        bs.main()
    finally:
        sys.argv = argv
    rec = json.loads(out.read_text().splitlines()[-1])
    assert rec["ab"] == ["fp32", "bf16"]
    assert len(rec["paired_ratio_b_over_a"]) == 2
    assert rec["ratio_min"] <= rec["ratio_geomean"] <= rec["ratio_max"]


def test_bench_train_ab_mode(tmp_path):
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench_train", "/root/repo/scripts/bench_train.py")
    bt = importlib.util.module_from_spec(spec)
    out = tmp_path / "ab.jsonl"
    argv = sys.argv
    sys.argv = ["bench_train", "--cpu", "--ab", "stem_s2d", "--batch", "2",
                "--img", "32", "--iters", "4", "--ab_rounds", "2",
                "--warmup", "1", "--out", str(out)]
    try:
        spec.loader.exec_module(bt)
        bt.main()
    finally:
        sys.argv = argv
    rec = json.loads(out.read_text().splitlines()[-1])
    assert rec["ab_flag"] == "stem_s2d"
    assert len(rec["paired_ratio_on_over_off"]) == 2
    assert all(r > 0 for r in rec["rate_off_img_per_s"])
