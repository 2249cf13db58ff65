"""Guarded dataset download lifecycle.

The reference's DataModules download in ``prepare_data()`` (torchvision
``DataModules.py:42-44``, AgML ``DataModules.py:166-172``). This build runs
offline-first: every datamodule reads local files, and ``prepare_data()``
only attempts a download when

* the dataset files are absent, AND
* ``NFP_TPU_OFFLINE`` is not set, AND
* the network is actually reachable (cheap TCP probe, cached per process).

So in this (zero-egress) container ``prepare_data()`` stays a no-op, while
on a networked machine it fills ``data_dir`` with the same layouts the
offline loaders read (torchvision ``cifar-10-batches-py``, ``FashionMNIST/
raw`` IDX files, class-subfolder trees for the folder datasets).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import socket
import tarfile
import urllib.request
import zipfile
from typing import Iterable, Optional

__all__ = ["network_available", "download_file", "extract_archive",
           "find_class_root", "DATASET_URLS", "dataset_url",
           "is_download_leader", "download_barrier"]

#: set to "1" to hard-disable all downloads regardless of reachability
OFFLINE_ENV = "NFP_TPU_OFFLINE"
#: skip the TCP probe and treat the network as reachable — for mocked-
#: download rehearsals against a localhost mirror (reproduce_readme
#: --smoke) where the public-host probe would fail in an offline CI
FORCE_ONLINE_ENV = "NFP_TPU_ASSUME_ONLINE"

#: canonical dataset sources (same hosts torchvision/torchgeo/AgML use).
#: The entries added in round 4 (RESISC45/PlantVillage/sugarcane) are the
#: best-known public mirrors; this container has zero egress, so they are
#: validated by post-extract STRUCTURE (class-subfolder count,
#: ``FolderDataModule.prepare_data``) rather than md5, and every one can
#: be overridden without a code edit via ``NFP_TPU_URL_<DATASET>`` (see
#: :func:`dataset_url`) or placed manually per docs/DATASETS.md.
DATASET_URLS = {
    "cifar10": "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
    "fashionmnist_base":
        "http://fashion-mnist.s3-website.eu-central-1.amazonaws.com/",
    "UCMerced":
        "http://weegee.vision.ucmerced.edu/datasets/UCMerced_LandUse.zip",
    "EuroSAT_rgb": "https://madm.dfki.de/files/sentinel/EuroSAT.zip",
    "EuroSAT_ms": "https://madm.dfki.de/files/sentinel/EuroSATallBands.zip",
    # torchgeo's Hugging Face mirror of NWPU-RESISC45 (torchgeo
    # datasets/resisc45.py; the original OneDrive .rar is unfetchable
    # programmatically and rar is unsupported here)
    "RESISC45":
        "https://hf.co/datasets/torchgeo/resisc45/resolve/main/"
        "NWPU-RESISC45.zip",
    # Mendeley Data mirror of the PlantVillage leaf-disease corpus
    # (Hughes & Salathé; "without augmentation" variant — 39 class
    # folders incl. `Background_without_leaves`, the reference's 38 +
    # background; PlantVillageDataModule adapts num_classes to the tree)
    "PlantVillage":
        "https://prod-dcd-datasets-cache-zipfiles.s3.eu-west-1."
        "amazonaws.com/tywbtsjrjv-1.zip",
    # AgML's public dataset bucket (agml.data sources; the reference's
    # sugarcane module loads through agml, DataModules.py:166-172)
    "sugarcane_damage_usa":
        "https://agdata-data.s3.us-west-1.amazonaws.com/"
        "sugarcane_damage_usa.zip",
    # GTOS-Mobile has NO stable direct-download URL (distributed via a
    # Dropbox folder from the authors' pytorch-material-classification
    # repo): set NFP_TPU_URL_GTOS_MOBILE to a direct archive link, or
    # place the class tree manually (docs/DATASETS.md)
    "GTOS-Mobile": None,
}


def dataset_url(name: str) -> Optional[str]:
    """Resolve the download URL for a dataset: the environment override
    ``NFP_TPU_URL_<NAME>`` (name upper-cased, non-alphanumerics → ``_``,
    e.g. ``NFP_TPU_URL_GTOS_MOBILE``) wins over the built-in
    :data:`DATASET_URLS` entry; ``None`` when neither exists."""
    key = "NFP_TPU_URL_" + "".join(
        c if c.isalnum() else "_" for c in name).upper()
    return os.environ.get(key) or DATASET_URLS.get(name)

#: well-known torchvision md5s (verified on download when present)
MD5S = {
    "cifar-10-python.tar.gz": "c58f30108f718f92721af3b95e74349a",
    "train-images-idx3-ubyte.gz": "8d4fb7e6c68d591d4c3dfef9ec88bf0d",
    "train-labels-idx1-ubyte.gz": "25c81989df183df01b3e8a0aad5dffbe",
    "t10k-images-idx3-ubyte.gz": "bef4ecab320f06d8554ea6380940ec79",
    "t10k-labels-idx1-ubyte.gz": "bb300cfdad3c16e7a12a480ee83cd310",
}

_probe_cache: Optional[bool] = None


def network_available(timeout: float = 3.0, force_probe: bool = False) -> bool:
    """True when downloads are permitted and a TCP connection to a public
    host succeeds. Result is cached per process (probes cost seconds)."""
    global _probe_cache
    if os.environ.get(OFFLINE_ENV, "") not in ("", "0"):
        return False
    if os.environ.get(FORCE_ONLINE_ENV, "") not in ("", "0"):
        return True
    if _probe_cache is not None and not force_probe:
        return _probe_cache
    ok = False
    for host, port in (("huggingface.co", 443), ("www.cs.toronto.edu", 443)):
        try:
            with socket.create_connection((host, port), timeout=timeout):
                ok = True
                break
        except OSError:
            continue
    _probe_cache = ok
    return ok


#: set to "1" when all processes share one filesystem (e.g. NFS-backed
#: GPU cluster): then only global process 0 downloads and the rest wait.
#: Default (unset) assumes TPU-pod topology — one process per host, each
#: with its OWN local disk — where every process must download its copy.
SHARED_FS_ENV = "NFP_TPU_SHARED_FS"


def is_download_leader() -> bool:
    """True when this process should perform downloads.

    Default: every process downloads — on a TPU pod each host has its own
    local disk, so a global-rank-0-only download (the Lightning shared-fs
    pattern) would leave every other host without data. Set
    ``NFP_TPU_SHARED_FS=1`` on shared filesystems to restrict downloads to
    process 0 (concurrent same-file writes are additionally kept safe by
    per-process temp names in ``download_file``)."""
    if os.environ.get(SHARED_FS_ENV, "") in ("", "0"):
        return True
    try:
        import jax  # noqa: PLC0415

        return jax.process_index() == 0
    except Exception:
        return True


def download_barrier(timeout_ms: int = 1_200_000) -> None:
    """Block until every process reaches this point (no-op single-process):
    no process may proceed to ``setup()`` before all downloads finish.

    Uses the coordination-service barrier, NOT a device collective:
    processes arrive with multi-minute skew (one may be fetching a 2 GB
    archive), and making the job's FIRST collective under that skew blows
    Gloo's hardcoded ~30 s context-init window (see
    ``__graft_entry__._mp_worker``). Falls back to a device barrier only
    if the private client API disappears."""
    try:
        import jax  # noqa: PLC0415

        if jax.process_count() <= 1:
            return
        try:
            from jax._src import distributed  # noqa: PLC0415

            distributed.global_state.client.wait_at_barrier(
                "nfp_tpu_prepare_data", timeout_ms)
            return
        except Exception:
            pass
        from jax.experimental import multihost_utils  # noqa: PLC0415

        multihost_utils.sync_global_devices("nfp_tpu_prepare_data")
    except ImportError:
        pass


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_file(url: str, dest: str, md5: Optional[str] = None,
                  timeout: float = 60.0) -> str:
    """Fetch ``url`` to ``dest`` atomically (tmp file + rename); verify md5
    when given (default: the known torchvision digest for the filename)."""
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    if md5 is None:
        md5 = MD5S.get(os.path.basename(dest))
    if os.path.exists(dest):
        if md5 is None or _md5(dest) == md5:
            return dest
        os.remove(dest)  # partial/corrupt leftover
    # per-process temp name: concurrent downloaders on one filesystem
    # (multi-process-per-host layouts) each write their own file; the
    # os.replace below is atomic and last-writer-wins with verified bytes
    tmp = f"{dest}.part{os.getpid()}"
    with urllib.request.urlopen(url, timeout=timeout) as r, \
            open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    if md5 is not None:
        got = _md5(tmp)
        if got != md5:
            os.remove(tmp)
            raise IOError(f"md5 mismatch for {url}: got {got}, want {md5}")
    os.replace(tmp, dest)
    return dest


def extract_archive(path: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            # the tar branch gets this via filter="data"; zip needs manual
            # member validation (several sources serve over plain http)
            for info in z.infolist():
                name = info.filename
                if name.startswith(("/", "\\")) or ".." in name.split("/"):
                    raise ValueError(f"unsafe zip member path: {name!r}")
            z.extractall(dest)
    elif path.endswith((".tar.gz", ".tgz", ".tar")):
        mode = "r:gz" if path.endswith(("gz",)) else "r"
        with tarfile.open(path, mode) as t:
            t.extractall(dest, filter="data")
    else:
        raise ValueError(f"unknown archive type: {path}")


def find_class_root(root: str,
                    img_exts: Iterable[str] = (".png", ".jpg", ".jpeg",
                                               ".tif", ".tiff", ".bmp"),
                    max_depth: int = 4) -> Optional[str]:
    """Locate the directory whose children are the class subfolders (each
    holding images) inside an extracted archive — e.g. UCMerced unzips to
    ``UCMerced_LandUse/Images/<class>/``."""
    exts = tuple(img_exts)

    def has_images(d: str) -> bool:
        try:
            return any(fn.lower().endswith(exts) for fn in os.listdir(d))
        except OSError:
            return False

    def is_class_root(d: str) -> bool:
        try:
            subdirs = [os.path.join(d, s) for s in os.listdir(d)
                       if os.path.isdir(os.path.join(d, s))]
        except OSError:
            return False
        return sum(has_images(s) for s in subdirs) >= 2

    def walk(d: str, depth: int) -> Optional[str]:
        try:
            subdirs = sorted(
                os.path.join(d, s) for s in os.listdir(d)
                if os.path.isdir(os.path.join(d, s)))
        except OSError:
            return None
        with_imgs = [s for s in subdirs if has_images(s)]
        if len(with_imgs) >= 2:
            return d
        # pre-split distributions (GTOS-Mobile: ``{train,test}/<class>/``):
        # the SPLIT ROOT is the class root's parent — returning it lets
        # FolderDataModule merge the branches; descending further would
        # silently pick whichever split sorts first
        if any(os.path.basename(s).lower() in ("train", "test", "val",
                                               "validation")
               and is_class_root(s) for s in subdirs):
            return d
        if depth >= max_depth:
            return None
        for s in subdirs:
            found = walk(s, depth + 1)
            if found:
                return found
        return None

    return walk(root, 0)
