"""Mocked-download rehearsal of the README reproduction protocol.

``scripts/reproduce_readme.py --smoke`` (round-4 VERDICT #8) must keep the
entire egress-gated path compiling and running: URL-override resolution,
``download_file`` over real HTTP (localhost mirror), archive extraction,
class-root discovery (including GTOS-Mobile's pre-split tree), pretrained
weights download + timm port, training and the test protocol. CI runs two
of the four rows — one covering the weights+UCMerced path, one covering the
GTOS merge+MobileNetV3 path; the other rows reuse the same machinery.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def test_reproduce_readme_smoke(tmp_path, monkeypatch):
    if SCRIPTS not in sys.path:
        sys.path.insert(0, SCRIPTS)
    import reproduce_readme

    monkeypatch.chdir(tmp_path)
    touched = ("NFP_TPU_ASSUME_ONLINE", "NFP_TPU_URL_UCMERCED",
               "NFP_TPU_URL_GTOS_MOBILE", "NFP_TPU_URL_PLANTVILLAGE",
               "NFP_TPU_WEIGHTS_URL_RESNET18")
    saved = {k: os.environ.get(k) for k in touched}
    from neighbour_feature_pooling_tpu.data import download as dl
    try:
        rc = reproduce_readme.main(
            ["--smoke", "--configs", "nfp_ucm", "radam_gtos"])
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        dl._probe_cache = None  # the mirror forced it True
    assert rc == 0
    results = json.loads((tmp_path / "reproduce_readme.json").read_text())
    assert results["nfp_ucm"]["status"] == "smoke_ok"
    assert results["radam_gtos"]["status"] == "smoke_ok"
    # the weights path genuinely ported a downloaded state_dict
    assert results["nfp_ucm"]["pretrained"].endswith("resnet18.pth")
