#!/usr/bin/env python
"""Accuracy-parity harness for the reference's published results.

The reference README (``/root/reference/README.md:68-76``) reports four
headline configurations (mean over seeds {42, 123, 999}, best-val_acc
checkpoint tested, ``demo.py:545-554``):

    ResNet18 + GAP            UCMerced      87.1 %
    ResNet18 + NFP (cosine)   UCMerced      91.5 %
    MobileNetV3 + RADAM       GTOS-Mobile   78.3 %
    ViT-Tiny + Lacunarity     PlantVillage  95.0 %

This script runs those configs through the TPU-native stack and compares the
3-seed mean accuracy against the table with a tolerance, exiting nonzero on
any miss — the scripted pass/fail that proves (or refutes) published-accuracy
reproduction the day datasets and pretrained weights are available.

This container has no network egress, so the two external inputs are
provided by the operator:

* ``--data_root DIR`` — folder datasets, one subdir per dataset
  (``UCMerced/``, ``GTOS-Mobile/``, ``PlantVillage/`` with one folder per
  class, the layout ``data/datamodules.py`` folder modules read);
* ``--weights_dir DIR`` — timm state_dicts named ``resnet18.pth``,
  ``mobilenetv3.pth``, ``vittiny.pth`` (or ``.npz``), ported into the
  backbones via ``models/backbones/timm_port.py``. The published numbers
  were obtained from timm ``pretrained=True`` backbones
  (``texture_pooling.py:19``); without weights the harness still runs but a
  miss is expected and ``--allow_missing_weights`` downgrades it to a
  warning.

Configs whose dataset directory is absent are SKIPPED (reported, exit 0
unless ``--require_all``). Usage:

    python scripts/reproduce_readme.py --data_root /data \
        --weights_dir /weights [--tolerance 2.0] [--configs nfp_ucm ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: README table (BASELINE.md); tolerance is in accuracy points.
CONFIGS = {
    "gap_ucm": {
        "dataset": "UCMerced", "model_type": "resnet18",
        "model_variant": "gap_only", "expected": 87.1,
    },
    "nfp_ucm": {
        "dataset": "UCMerced", "model_type": "resnet18",
        "model_variant": "texture_nfp", "similarity": "cosine",
        "expected": 91.5,
    },
    "radam_gtos": {
        "dataset": "GTOS-Mobile", "model_type": "mobilenetv3",
        "model_variant": "texture_radam", "expected": 78.3,
    },
    "lacunarity_pv": {
        "dataset": "PlantVillage", "model_type": "vittiny",
        "model_variant": "texture_lacunarity", "expected": 95.0,
    },
}

SEEDS = [42, 123, 999]  # demo.py:545-554


# ------------------------------------------------------------------ --smoke
# Mocked-download rehearsal (round-4 VERDICT #8): build tiny dataset
# archives + a weights file, serve them from a localhost HTTP mirror, and
# run the whole 4-row protocol (URL resolution -> download_file ->
# extract -> find_class_root -> scan/split -> train -> eval) at toy sizes
# so the egress-gated path cannot bit-rot. CI runs it via
# tests/test_reproduce_smoke.py.

def _smoke_write_tree(root, classes, per_class, rng, split_dirs=None):
    from PIL import Image

    roots = ([os.path.join(root, s) for s in split_dirs]
             if split_dirs else [root])
    for r in roots:
        for cls in classes:
            d = os.path.join(r, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(per_class):
                arr = (rng.random((12, 12, 3)) * 255).astype("uint8")
                Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))


def _smoke_fake_resnet18_pth(dest):
    """timm/torchvision-keyed random ResNet18 state_dict — shape-exact, so
    ``timm_port.port_resnet`` exercises the full porting path."""
    import numpy as np
    import torch

    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.tensor(
            (rng.standard_normal((o, i, k, k)) * 0.05).astype("float32"))

    def bn(name, c):
        sd[name + ".weight"] = torch.ones(c)
        sd[name + ".bias"] = torch.zeros(c)
        sd[name + ".running_mean"] = torch.zeros(c)
        sd[name + ".running_var"] = torch.ones(c)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for si, cout in enumerate((64, 128, 256, 512)):
        for bi in range(2):
            t = f"layer{si + 1}.{bi}"
            conv(f"{t}.conv1", cout, cin, 3)
            bn(f"{t}.bn1", cout)
            conv(f"{t}.conv2", cout, cout, 3)
            bn(f"{t}.bn2", cout)
            if cin != cout:
                conv(f"{t}.downsample.0", cout, cin, 1)
                bn(f"{t}.downsample.1", cout)
            cin = cout
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    torch.save(sd, dest)


def _smoke_mirror(tmpd):
    """Build the fixture archives + weights, serve them over localhost
    HTTP, set the URL/online env overrides. Returns a shutdown callable."""
    import http.server
    import shutil
    import threading

    import numpy as np

    rng = np.random.default_rng(7)
    stage = os.path.join(tmpd, "stage")
    mirror = os.path.join(tmpd, "mirror")
    os.makedirs(mirror, exist_ok=True)
    # 10 images/class so the stratified 70/10/20 split leaves val
    # non-empty (int(0.1*n) >= 1) and best-checkpoint selection is real.
    # UCMerced: the real zip nests <root>/UCMerced_LandUse/Images/<cls>/
    _smoke_write_tree(
        os.path.join(stage, "UCMerced", "UCMerced_LandUse", "Images"),
        [f"class{i:02d}" for i in range(21)], 10, rng)
    # GTOS-Mobile: the distribution's native pre-split layout (5+5)
    _smoke_write_tree(
        os.path.join(stage, "GTOS-Mobile", "gtos-mobile"),
        [f"terrain{i:02d}" for i in range(31)], 5, rng,
        split_dirs=("train", "test"))
    _smoke_write_tree(
        os.path.join(stage, "PlantVillage"),
        [f"leaf{i:02d}" for i in range(38)], 10, rng)
    for name in ("UCMerced", "GTOS-Mobile", "PlantVillage"):
        shutil.make_archive(os.path.join(mirror, name), "zip",
                            os.path.join(stage, name))
    _smoke_fake_resnet18_pth(os.path.join(mirror, "resnet18.pth"))

    class _QuietHandler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=mirror, **kw)

        def log_message(self, fmt, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0),
                                            _QuietHandler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    os.environ["NFP_TPU_ASSUME_ONLINE"] = "1"
    os.environ["NFP_TPU_URL_UCMERCED"] = f"{base}/UCMerced.zip"
    os.environ["NFP_TPU_URL_GTOS_MOBILE"] = f"{base}/GTOS-Mobile.zip"
    os.environ["NFP_TPU_URL_PLANTVILLAGE"] = f"{base}/PlantVillage.zip"
    os.environ["NFP_TPU_WEIGHTS_URL_RESNET18"] = f"{base}/resnet18.pth"
    return httpd.shutdown

#: default pretrained-backbone sources for ``--download``. The torchvision
#: resnet18 state_dict uses the same key names timm does, so it ports
#: directly (``models/backbones/timm_port.py``). mobilenetv3/vittiny ship
#: as HF-hosted safetensors with no stable plain-URL mirror — supply
#: ``--weights_url model=url`` or ``NFP_TPU_WEIGHTS_URL_<MODEL>`` for them.
WEIGHTS_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-f37072fd.pth",
}


def resolve_weights(args, model_type: str):
    """Local weights file for ``model_type``, downloading it when
    ``--download`` is set and a URL is known (flag > env > built-in)."""
    wdir = args.weights_dir or os.path.join(args.data_root, "weights")
    if args.weights_dir:
        for ext in (".pth", ".pt", ".npz"):
            p = os.path.join(args.weights_dir, model_type + ext)
            if os.path.exists(p):
                return p
    if not getattr(args, "download", False):
        return None
    url = (dict(getattr(args, "weights_url", None) or {}).get(model_type)
           or os.environ.get(f"NFP_TPU_WEIGHTS_URL_{model_type.upper()}")
           or WEIGHTS_URLS.get(model_type))
    if not url:
        return None
    from neighbour_feature_pooling_tpu.data.download import (
        download_file, network_available)

    if not network_available():
        return None
    ext = os.path.splitext(url)[1] or ".pth"
    dest = os.path.join(wdir, model_type + ext)
    if os.path.exists(dest):
        return dest
    try:
        return download_file(url, dest)
    except Exception as e:
        print(f"WARN: weights download failed for {model_type}: {e}")
        return None


def ensure_dataset(args, cfg: dict, config: dict) -> bool:
    """True when the dataset directory exists, attempting the datamodule's
    own guarded download lifecycle (``data/download.py``) first when
    ``--download`` is set. No-ops offline (the network probe fails)."""
    data_dir = config["data_dir"]
    if os.path.isdir(data_dir):
        return True
    if not getattr(args, "download", False):
        return False
    from neighbour_feature_pooling_tpu.data import get_datamodule

    dm = get_datamodule(cfg["dataset"], config)
    try:
        dm.prepare_data()
    except Exception as e:
        print(f"WARN: dataset download failed for {cfg['dataset']}: {e}")
    resolved = getattr(dm, "data_dir", None) or data_dir
    if os.path.isdir(resolved):
        config["data_dir"] = resolved
        return True
    return False


def build_config(name: str, cfg: dict, args) -> dict:
    from neighbour_feature_pooling_tpu.data import DATASET_NUM_CLASSES

    weights = resolve_weights(args, cfg["model_type"])
    config = {
        "name": f"repro_{name}",
        "data_dir": os.path.join(args.data_root, cfg["dataset"]),
        "batch_size": {"train": args.batch_size, "val": args.batch_size,
                       "test": args.batch_size},
        "num_workers": args.num_workers,
        "learning_rate": 1e-4,            # demo.py:461 default
        "max_epochs": args.max_epochs,    # demo.py:436 default 200
        "resize_size": 256, "input_size": 224,  # demo.py:459-460
        "num_classes": DATASET_NUM_CLASSES.get(cfg["dataset"], 10),
        "patience": 10, "min_delta": 1e-4,
        "similarity": cfg.get("similarity", "cosine"),
        "dataset": cfg["dataset"],
        "model_type": cfg["model_type"],
        "model_variant": cfg["model_variant"],
        "nfp_radius": 1, "nfp_padding": 0, "nfp_stride": 1,
        "nfp_layer_idx": 3, "nfp_insert_idx": 1,
        "nfp_intermediate_layer_idx": 1, "nfp_mid_layer_idx": 1,
        "num_devices": None, "bf16": args.bf16,
        "scheduler": "none", "label_smoothing": 0.05,
        "pretrained": weights,
        # default OFF: the host pipeline is the faithful reproduction of
        # the reference's torchvision transforms; --device_data trades
        # antialiased train crops for device-resident speed (eval stays
        # ~1e-6-exact via the matmul resize path)
        "device_data": args.device_data, "device_eval": args.device_data,
    }
    if getattr(args, "smoke", False):
        # toy sizes — 96px keeps every head geometry valid (texture_nfp
        # runs padding=0 on the /32 tail, so the map must be >=3x3);
        # num_devices pinned to 1 (CPU multi-device training risks the
        # XLA:CPU all-reduce rendezvous abort, CLAUDE.md)
        config.update(resize_size=104, input_size=96, num_devices=1,
                      patience=1)
    return config


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_root", type=str, default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="mocked-download rehearsal: tiny fixture archives "
                         "served from a localhost mirror, 1 seed, 1 epoch, "
                         "12px — exercises the ENTIRE --download protocol "
                         "(URL override resolution, download, extract, "
                         "class-root discovery incl. GTOS's pre-split "
                         "tree, weights download + timm port, train, "
                         "eval) with no egress; accuracy is NOT compared")
    ap.add_argument("--weights_dir", type=str, default=None)
    ap.add_argument("--tolerance", type=float, default=2.0,
                    help="allowed |mean - published| in accuracy points "
                         "(published numbers are 3-seed means of a "
                         "stochastic training run)")
    ap.add_argument("--configs", nargs="+", choices=sorted(CONFIGS),
                    default=sorted(CONFIGS))
    ap.add_argument("--max_epochs", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--num_workers", type=int, default=0)
    ap.add_argument("--device_data", action="store_true",
                    help="keep decoded splits device-resident (uint8, "
                         "uploaded once) with on-device augment/eval — "
                         "much faster on TPU hosts, but train crops use "
                         "antialias=False semantics instead of the "
                         "reference's PIL-antialiased pipeline")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--require_all", action="store_true",
                    help="missing dataset dirs fail instead of skipping")
    ap.add_argument("--download", action="store_true",
                    help="fetch missing datasets (data/download.py guarded "
                         "lifecycle) and pretrained weights (torchvision "
                         "resnet18 by default; --weights_url/"
                         "NFP_TPU_WEIGHTS_URL_<MODEL> for others) so a "
                         "networked machine goes from nothing to pass/fail "
                         "in one command")
    ap.add_argument("--weights_url", action="append", default=[],
                    metavar="MODEL=URL",
                    help="pretrained state_dict URL per backbone, e.g. "
                         "resnet18=https://.../resnet18.pth (repeatable)")
    ap.add_argument("--allow_missing_weights", action="store_true",
                    help="warn instead of fail when no pretrained weights "
                         "are given (from-scratch runs will miss the table)")
    ap.add_argument("--out", type=str, default="reproduce_readme.json")
    args = ap.parse_args(argv)
    args.weights_url = dict(s.split("=", 1) for s in args.weights_url)

    stop_mirror = None
    seeds = SEEDS
    if args.smoke:
        import tempfile

        tmpd = tempfile.mkdtemp(prefix="nfp_smoke_")
        stop_mirror = _smoke_mirror(tmpd)
        args.data_root = os.path.join(tmpd, "data")
        args.download = True
        args.allow_missing_weights = True
        args.require_all = True      # a failed mocked download must FAIL
        args.max_epochs = 1
        args.batch_size = 8
        seeds = [42]
        print(f"--smoke: localhost mirror up, data_root={args.data_root}")
    elif not args.data_root:
        ap.error("--data_root is required (or use --smoke)")

    import numpy as np

    from neighbour_feature_pooling_tpu.cli import run_experiment
    from neighbour_feature_pooling_tpu.utils import enable_compilation_cache

    if not args.smoke:
        enable_compilation_cache()

    results = {}
    failures = []
    for name in args.configs:
        cfg = CONFIGS[name]
        config = build_config(name, cfg, args)
        if not ensure_dataset(args, cfg, config):
            msg = (f"SKIP {name}: dataset dir {config['data_dir']} not "
                   f"found" + (" (download attempted)"
                               if args.download else ""))
            print(msg)
            results[name] = {"status": "skipped", "reason": msg}
            if args.require_all:
                failures.append(msg)
            continue
        if config["pretrained"] is None and (args.weights_dir
                                             or args.download):
            msg = (f"{name}: no {cfg['model_type']} weights in "
                   f"{args.weights_dir}")
            if not args.allow_missing_weights:
                failures.append(msg)
                results[name] = {"status": "failed", "reason": msg}
                continue
            print("WARN", msg)

        accs = []
        for seed in seeds:
            print(f"==== {name} seed {seed} ====")
            accs.append(100.0 * run_experiment(seed, config))
        mean, std = float(np.mean(accs)), float(np.std(accs))
        delta = mean - cfg["expected"]
        if args.smoke:  # completion is the assertion, not accuracy
            results[name] = {"status": "smoke_ok", "accs": accs,
                             "pretrained": config["pretrained"]}
            print(f"SMOKE OK {name}: ran {len(accs)} seed(s), "
                  f"acc {mean:.1f}")
            continue
        ok = abs(delta) <= args.tolerance or delta > 0  # beating it is fine
        results[name] = {
            "status": "pass" if ok else "fail",
            "accs": accs, "mean": mean, "std": std,
            "expected": cfg["expected"], "delta": delta,
            "pretrained": config["pretrained"],
        }
        line = (f"{name}: {mean:.1f} ± {std:.1f} (published "
                f"{cfg['expected']:.1f}, Δ {delta:+.1f})")
        print(("PASS " if ok else "FAIL ") + line)
        if not ok:
            failures.append(line)

    if stop_mirror is not None:
        stop_mirror()
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results written to {args.out}")
    if failures:
        print("FAILURES:")
        for f_ in failures:
            print("  -", f_)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
