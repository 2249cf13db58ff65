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


def test_measure_chip_probe_smoke(bench):
    """The drift-normalizer probe added in round 5 (record
    ["chip_probe_tflops"]) — tiny shape on CPU, only finiteness checked."""
    v = bench.measure_chip_probe(n=64, iters=2, k=1)
    assert v > 0


def test_roofline_train_smoke(tmp_path):
    """scripts/roofline_train.py --cpu: the jaxpr walk + traffic pricing
    must keep working against the live model registry (round-5 MFU
    close-out artifact)."""
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location(
        "roofline_train", "/root/repo/scripts/roofline_train.py")
    rt = importlib.util.module_from_spec(spec)
    out = tmp_path / "roofline.jsonl"
    argv = sys.argv
    sys.argv = ["roofline_train", "--cpu", "--batch", "2", "--img", "64",
                "--out", str(out)]
    try:
        spec.loader.exec_module(rt)
        rt.main()
    finally:
        sys.argv = argv
    rec = json.loads(out.read_text().splitlines()[-1])
    assert rec["n_conv_dot"] >= 20          # every RN18 conv + head dots
    assert rec["traffic_lb_mb"] > 0 and rec["lb_ms_at_820GBps"] > 0


def test_bench_sp_fallback_smoke(tmp_path):
    """scripts/bench_sp_fallback.py at toy size: the eligible config must
    compile to the halo path (collective-permutes, zero all-gathers) and
    the ineligible ones to the replication fallback (round-5 VERDICT #5
    artifact)."""
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench_sp_fallback", "/root/repo/scripts/bench_sp_fallback.py")
    bf = importlib.util.module_from_spec(spec)
    out = tmp_path / "sp.jsonl"
    argv = sys.argv
    sys.argv = ["bench_sp_fallback", "--h", "64", "--w", "64", "--c", "8",
                "--iters", "1", "--out", str(out)]
    try:
        spec.loader.exec_module(bf)
        bf.main()
    finally:
        sys.argv = argv
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    by = {r["config"]: r for r in recs}
    assert by["eligible_same"]["all_gathers"] == 0
    assert by["eligible_same"]["collective_permutes"] >= 2
    assert by["fallback_stride2"]["all_gathers"] >= 1
    assert by["fallback_pad0"]["all_gathers"] >= 1
