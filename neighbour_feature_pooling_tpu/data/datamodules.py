"""Data modules: the L3 layer of the framework.

Re-implements the contract of the reference's Lightning DataModules —
both the shipped ones (``/root/reference/DataModules.py``) and the five
ACTIVE modules whose file is missing from the reference snapshot
(``datasetsnew.DataModules``, imported at ``demo.py:26``; contract
reconstructed from the call sites, SURVEY §2.3):

* ``prepare_data()`` / ``setup(stage)`` lifecycle;
* per-split batch sizes via a ``{'train','val','test'}`` dict;
* ``num_classes`` / ``num_input_channels`` attributes;
* ``print_first_batch_shape()`` debug hook (``demo.py:246-247``).

Batches are ``{"image": NHWC f32, "label": i32, "weight": f32}`` numpy dicts;
the last batch of a split is zero-padded with ``weight=0`` so every step has
a static shape under jit.

Dataset registry (``demo.py:479-502``): UCMerced 21, RESISC45 45, MSTAR 6,
cifar10 10, GTOS-Mobile 31, PlantVillage 38, EuroSAT 10 (13 bands). In this
offline environment downloads are impossible; folder-backed modules read
standard class-subfolder trees from ``data_dir`` and raise a clear error
otherwise, and ``SyntheticDataModule`` provides a zero-dependency stand-in
for smoke training and benchmarks.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .transforms import TransformConfig, eval_transform, train_transform

__all__ = [
    "Batch",
    "DataModule",
    "ArrayDataModule",
    "SyntheticDataModule",
    "FolderDataModule",
    "UCMercedDataModule",
    "RESISC45DataModule",
    "GTOSMobileDataModule",
    "PlantVillageDataModule",
    "EuroSATDataModule",
    "MSTARDataModule",
    "SugarcaneDamageUSADataModule",
    "CIFAR10DataModule",
    "FashionMNISTDataModule",
    "DATASET_NUM_CLASSES",
    "get_datamodule",
]

Batch = Dict[str, np.ndarray]

#: ``demo.py:494-502`` (PlantVillage: 38 per the CLI table; the conflicting
#: 15 in the Params dict at demo.py:287 is a reference inconsistency).
DATASET_NUM_CLASSES = {
    "UCMerced": 21,
    "RESISC45": 45,
    "MSTAR": 6,
    "cifar10": 10,
    "GTOS-Mobile": 31,
    "PlantVillage": 38,
    "EuroSAT": 10,
    "synthetic": 4,
}

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp", ".gif")


def _pad_batch(images, labels: np.ndarray, batch_size: int) -> Batch:
    """Zero-pad to ``batch_size`` rows with a masking weight channel.
    ``images`` may be a numpy array (host pipelines) or a jax array
    (device-augment path) — padding stays in the array's own namespace so
    device batches are never pulled back to the host."""
    n = images.shape[0]
    weight = np.ones((batch_size,), np.float32)
    if n < batch_size:
        pad = batch_size - n
        if isinstance(images, np.ndarray):
            xp = np
        else:
            import jax.numpy as xp  # noqa: PLC0415
        images = xp.concatenate(
            [images, xp.zeros((pad,) + images.shape[1:], images.dtype)])
        labels = np.concatenate([labels, np.zeros((pad,), labels.dtype)])
        weight[n:] = 0.0
    if isinstance(images, np.ndarray):
        images = images.astype(np.float32)
    return {"image": images,
            "label": labels.astype(np.int32), "weight": weight}


class DataModule:
    """Base lifecycle + iteration API."""

    num_classes: int = 0
    num_input_channels: int = 3

    def prepare_data(self) -> None:  # downloads in the reference; no-op here
        pass

    def setup(self, stage: Optional[str] = None) -> None:
        raise NotImplementedError

    def train_batches(self, epoch: int = 0) -> Iterator[Batch]:
        raise NotImplementedError

    def val_batches(self) -> Iterator[Batch]:
        raise NotImplementedError

    def test_batches(self) -> Iterator[Batch]:
        raise NotImplementedError

    def print_first_batch_shape(self) -> None:  # demo.py:246-247
        batch = next(iter(self.train_batches()))
        print(f"First batch image shape: {batch['image'].shape}, "
              f"labels: {batch['label'].shape}")

    #: multi-host: explicit overrides; None = ask jax (1 process -> no-op)
    process_index: Optional[int] = None
    process_count: Optional[int] = None

    def _process_info(self) -> Tuple[int, int]:
        """(process_index, process_count) for per-process batch slicing.

        Each process decodes/augments ONLY its rows of every global batch
        (the trainer assembles them into one globally-sharded array via
        ``parallel.dist.global_batch_from_local``) — N-times-redundant host
        augmentation would otherwise eat the multi-host speedup."""
        if self.process_index is not None and self.process_count is not None:
            return self.process_index, self.process_count
        try:
            import jax  # noqa: PLC0415

            if jax.process_count() > 1:
                return jax.process_index(), jax.process_count()
        except Exception:
            pass
        return 0, 1


@dataclasses.dataclass
class _Split:
    images: List  # lazily decoded items (np arrays or file paths)
    labels: np.ndarray


class ArrayDataModule(DataModule):
    """In-memory dataset with the reference transform pipeline."""

    def __init__(self, num_classes: int, batch_size=32, num_workers: int = 0,
                 transform: Optional[TransformConfig] = None, seed: int = 42,
                 num_input_channels: int = 3, split_seed: int = 42):
        self.num_classes = num_classes
        self.num_input_channels = num_input_channels
        if isinstance(batch_size, int):
            batch_size = {"train": batch_size, "val": batch_size,
                          "test": batch_size}
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.transform = transform or TransformConfig()
        #: per-run seed: shuffling order + augmentation randomness
        self.seed = seed
        #: fixed seed for the train/val/test split, so the 3-seed protocol
        #: evaluates on a CONSTANT test set while shuffling/augment vary
        #: (the reference fixes its split generators at 42 too,
        #: DataModules.py:61)
        self.split_seed = split_seed
        self._splits: Dict[str, _Split] = {}

    # -- subclasses fill self._splits in setup() --

    def _decode(self, item) -> np.ndarray:
        """item -> HWC image: uint8 in [0, 255] for file decodes, or the
        array itself for in-memory datasets (float32 in [0, 1]).

        uint8 is the decoder's native output; keeping it (instead of the
        round-1 float32/255 convention) quadruples the decoded-image cache
        capacity and cuts host->device transfer 4x on the device-augment
        path — through this container's TPU relay that is the difference
        between a 25 MB and a 6 MB upload per batch. Every augment consumer
        (python/PIL, native C++, device kernel) converts to [0, 1] float
        itself, so the two conventions are interchangeable."""
        if isinstance(item, np.ndarray):
            return item
        from PIL import Image

        with Image.open(item) as im:
            arr = np.asarray(im.convert("RGB"))
        return arr

    #: decoded-image cache budget in MB (0 disables). Default 1024, env
    #: override ``NFP_TPU_DECODE_CACHE_MB``. The reference re-decodes every
    #: image every epoch in its DataLoader workers; these datasets are small
    #: (UCMerced train = 290 MB decoded uint8), so caching the decoded
    #: arrays makes every epoch after the first augment-only — decode stops
    #: being the host-pipeline ceiling (round-2 VERDICT missing #2).
    #: Oversized datasets fill the cache partially (first-seen images) and
    #: decode the rest per epoch.
    decode_cache_mb: Optional[int] = None

    def _decode_cache_budget(self) -> int:
        mb = self.decode_cache_mb
        if mb is None:
            mb = int(os.environ.get("NFP_TPU_DECODE_CACHE_MB", "1024"))
        return mb * (1 << 20)

    def _decode_cached(self, item) -> np.ndarray:
        if isinstance(item, np.ndarray):
            return item
        cache = getattr(self, "_decode_cache", None)
        if cache is None:
            cache = self._decode_cache = {}
            self._decode_cache_bytes = 0
        hit = cache.get(item)
        if hit is not None:
            return hit
        arr = self._decode(item)
        if self._decode_cache_bytes + arr.nbytes <= self._decode_cache_budget():
            cache[item] = arr
            self._decode_cache_bytes += arr.nbytes
        return arr

    def _decode_pool(self):
        """Shared decode thread pool (``num_workers`` threads, lazily built).

        The reference decodes in 12 DataLoader worker *processes*
        (``/root/reference/demo.py:523``); here threads suffice because
        PIL's JPEG/PNG decoders and tifffile's codecs release the GIL for
        the heavy work, and thread workers hand numpy arrays to the augment
        stage with zero IPC/pickling cost."""
        if self.num_workers <= 1:
            return None
        pool = getattr(self, "_decode_executor", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

            pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="nfp-decode")
            self._decode_executor = pool
        return pool

    def _decode_many(self, items) -> List[np.ndarray]:
        """Decode a batch of items, in order, across the worker pool,
        through the decoded-image cache. (Cache bookkeeping races across
        pool threads are benign: worst case the budget overshoots by a few
        images or an image is decoded twice to the same value.)"""
        pool = self._decode_pool()
        if pool is None or all(isinstance(it, np.ndarray) for it in items):
            return [self._decode_cached(it) for it in items]
        return list(pool.map(self._decode_cached, items))

    def close(self) -> None:
        """Release the decode pool and any device-resident split (safe to
        call repeatedly)."""
        pool = getattr(self, "_decode_executor", None)
        if pool is not None:
            pool.shutdown(wait=False)
            self._decode_executor = None
        self._device_split_cache = {}  # drops the HBM chunk references

    #: "auto" = use the native C++ augment kernel when the library builds;
    #: False = always the python/PIL path (the parity oracle).
    use_native: object = "auto"

    #: True = run TRAIN-batch crop+resize+flip+normalize on the accelerator
    #: (``data/device_augment.py``): the host only plans crops, removing the
    #: CPU ceiling on few-core hosts. Opt-in; needs uniform decoded shapes
    #: in each batch (falls back to the host path otherwise). Eval batches
    #: always use the host pipeline (bit-exact reference parity).
    use_device_augment: bool = False

    #: True = upload the decoded TRAIN split to the accelerator ONCE
    #: (``data/device_data.py``) and gather + augment rows on device each
    #: step; the host sends only indices and crop plans (a few KB/step)
    #: instead of re-streaming pixels every epoch like the reference's
    #: DataLoader (``/root/reference/demo.py:523``). Train pixels are
    #: bit-identical to the ``use_device_augment`` path (same per-record
    #: crop plans, same device kernel). Falls back to the streaming paths
    #: when shapes are mixed or the split exceeds the HBM budget
    #: (``NFP_TPU_DEVICE_DATA_MB``, default 4096). Eval stays on the host
    #: pipeline (bit-exact reference parity).
    use_device_data: bool = False

    #: True = ALSO run EVAL batches from device-resident splits, with the
    #: antialiased Resize+CenterCrop expressed as two MXU matmuls built
    #: from PIL's exact triangle-filter weights (``data/device_eval.py``).
    #: Matches the host eval oracle to ~1e-6 per pixel (same weights,
    #: different accumulation order) — opt-in so default eval metrics stay
    #: bit-exact vs the reference pipeline. Same uniform-shape/HBM-budget
    #: fallbacks as ``use_device_data``.
    use_device_eval: bool = False

    def _native_enabled(self) -> bool:
        if self.use_native is False:
            return False
        try:
            from .. import native  # noqa: PLC0415

            return native.native_available()
        except Exception:
            return False

    def _iter(self, split: str, shuffle: bool, epoch: int) -> Iterator[Batch]:
        sp = self._splits[split]
        n = len(sp.images)
        bs = self.batch_size[split if split in self.batch_size else "test"]
        order = np.arange(n)
        rng = np.random.default_rng(self.seed * 1_000_003 + epoch)
        if shuffle:
            rng.shuffle(order)
        native_ok = self._native_enabled()
        # Training drops the final partial batch (unless it is the only one):
        # zero-padded rows would pollute BatchNorm batch statistics — the
        # weight channel masks loss/metrics but not BN. Eval keeps the padded
        # tail (BN uses running stats there) so every example is scored.
        end = n
        if shuffle and n >= bs:
            end = (n // bs) * bs
        want_dd = self.use_device_data if shuffle else self.use_device_eval
        dd = self._device_split(split) if want_dd else None
        pi, pc = self._process_info()
        pad_to = bs
        if pc > 1:
            if bs % pc:
                raise ValueError(
                    f"global batch size {bs} not divisible by process "
                    f"count {pc}")
            pad_to = bs // pc
        for start in range(0, end, bs):
            idx = order[start: start + bs]
            if pc > 1:
                # this process's contiguous row block of the global batch
                # (padding rows conceptually fill the tail, so a short final
                # eval batch still splits consistently across processes)
                idx = idx[pi * pad_to: (pi + 1) * pad_to]
            # per-RECORD augmentation rngs (seed, epoch, sample index): the
            # random crop/flip of a sample is independent of batch order and
            # process layout, so multi-host runs augment identically to
            # single-host ones (grain-style per-record seeding)
            img_rngs = [np.random.default_rng([self.seed, epoch, int(i)])
                        for i in idx]
            if dd is not None and len(idx) > 0:
                # device-resident split: no host decode, no pixel upload
                if shuffle:
                    imgs = self._augment_resident(dd, idx, img_rngs)
                    yield _pad_batch(imgs, sp.labels[idx], pad_to)
                    continue
                # eval: gather a full pad_to of rows (tail batches repeat
                # row 0) so the jitted kernels see ONE shape, and mask the
                # padding with the weight channel like _pad_batch does
                k = len(idx)
                gid = np.concatenate(
                    [idx, np.zeros(pad_to - k, idx.dtype)])
                weight = np.ones((pad_to,), np.float32)
                weight[k:] = 0.0
                labels = np.concatenate(
                    [sp.labels[idx], np.zeros(pad_to - k, sp.labels.dtype)])
                yield {"image": self._eval_resident(dd, gid),
                       "label": labels.astype(np.int32), "weight": weight}
                continue
            raw = self._decode_many([sp.images[i] for i in idx])
            if len(raw) == 0:
                # all of this process's rows are padding (tiny tail batch)
                c = self.num_input_channels
                imgs = np.zeros((0, self.transform.input_size,
                                 self.transform.input_size, c), np.float32)
            elif (shuffle and self.use_device_augment
                  and self._device_shape_ok(raw)):
                # multi-process runs keep the augmented rows on device too:
                # the trainer assembles local device shards into the global
                # array via make_array_from_single_device_arrays
                # (parallel.dist._global_from_local_device_rows)
                imgs = self._augment_device(raw, img_rngs)
            elif native_ok:
                imgs = self._augment_native(raw, shuffle, img_rngs)
            else:
                imgs = np.stack([
                    train_transform(img, self.transform, r) if shuffle
                    else eval_transform(img, self.transform)
                    for img, r in zip(raw, img_rngs)])
            yield _pad_batch(imgs, sp.labels[idx], pad_to)

    def _augment_native(self, raw, train: bool, img_rngs) -> np.ndarray:
        """Single fused crop+resize+flip+normalize batch call (C++)."""
        from .. import native  # noqa: PLC0415
        from .transforms import plan_eval, plan_train  # noqa: PLC0415

        from .device_augment import normalization_constants  # noqa: PLC0415

        cfg = self.transform
        crops, flips = [], []
        for img, r in zip(raw, img_rngs):
            if train:
                box, flip = plan_train(img.shape[:2], cfg, r)
            else:
                box, flip = plan_eval(img.shape[:2], cfg), 0
            crops.append(box)
            flips.append(flip)
        mean, std = normalization_constants(cfg, raw[0].shape[2])
        return native.augment_batch(
            raw, np.asarray(crops, np.int32), np.asarray(flips, np.int32),
            (cfg.input_size, cfg.input_size), mean, std,
            num_threads=max(self.num_workers, 1) if self.num_workers else 0)

    def _device_shape_ok(self, raw) -> bool:
        """Device path only for batches matching ONE pinned source shape:
        each distinct (B, H, W, C) signature costs a full XLA compile
        (20 s–6 min through the TPU relay), so mixed-resolution folder
        datasets route their off-shape batches to the host path instead of
        recompiling mid-epoch."""
        shapes = {im.shape for im in raw}
        if len(shapes) != 1:
            return False
        shape = next(iter(shapes))
        pinned = getattr(self, "_device_aug_shape", None)
        if pinned is None:
            self._device_aug_shape = shape
            return True
        return shape == pinned

    def _augment_device(self, raw, img_rngs):
        """Plan crops on host, run the pixel work on the accelerator
        (``device_augment.augment_batch_device``). Returns a device array;
        downstream ``jnp.asarray``/``device_put`` are no-ops."""
        import jax.numpy as jnp  # noqa: PLC0415

        from .device_augment import (augment_batch_device,  # noqa: PLC0415
                                     normalization_constants)
        from .transforms import plan_train  # noqa: PLC0415

        cfg = self.transform
        plans = [plan_train(img.shape[:2], cfg, r)
                 for img, r in zip(raw, img_rngs)]
        crops = np.asarray([p[0] for p in plans], np.int32)
        flips = np.asarray([p[1] for p in plans], np.int32)
        mean, std = normalization_constants(cfg, raw[0].shape[2])
        return augment_batch_device(jnp.asarray(np.stack(raw)),
                                    jnp.asarray(crops), jnp.asarray(flips),
                                    cfg.input_size, jnp.asarray(mean),
                                    jnp.asarray(std))

    def _device_split(self, split: str):
        """Lazily build (and cache) the device-resident copy of a split;
        None when ineligible (mixed shapes, HBM budget, no accelerator) —
        the iterator then falls through to the streaming paths."""
        cache = getattr(self, "_device_split_cache", None)
        if cache is None:
            cache = self._device_split_cache = {}
        if split in cache:
            return cache[split]
        import logging  # noqa: PLC0415

        from .device_data import build_device_split  # noqa: PLC0415

        log = logging.getLogger("nfp_tpu.data")
        dd = None
        budget = int(os.environ.get("NFP_TPU_DEVICE_DATA_MB", "4096"))
        try:
            items = self._splits[split].images
            # bulk one-time decode across the worker pool, bypassing the
            # decoded-image cache (rows live on device afterwards; caching
            # them host-side too would just double the footprint)
            pool = self._decode_pool()
            mapper = pool.map if pool is not None else map
            imgs = list(mapper(self._decode, items))
            dd = build_device_split(imgs, budget_mb=budget)
        except Exception as e:  # e.g. no jax backend in a pure-host context
            log.warning("device split %r build failed (%s); streaming",
                        split, e)
            dd = None
        else:
            if dd is None:
                log.info("device split %r ineligible (mixed shapes or over "
                         "%d MB); streaming", split, budget)
            else:
                log.info("device split %r resident: %d imgs, %.0f MB in %d "
                         "chunk(s)", split, dd.n, dd.nbytes / (1 << 20),
                         len(dd.chunks))
        cache[split] = dd
        return dd

    def _augment_resident(self, dd, idx, img_rngs):
        """Gather rows of a device-resident split and augment them on
        device — pixels bit-identical to ``_augment_device`` (same
        per-record plans, same kernel), with zero host pixel traffic."""
        import jax.numpy as jnp  # noqa: PLC0415

        from .device_augment import (augment_batch_device,  # noqa: PLC0415
                                     normalization_constants)
        from .transforms import plan_train  # noqa: PLC0415

        cfg = self.transform
        plans = [plan_train(dd.shape[:2], cfg, r) for r in img_rngs]
        crops = np.asarray([p[0] for p in plans], np.int32)
        flips = np.asarray([p[1] for p in plans], np.int32)
        mean, std = normalization_constants(cfg, dd.shape[2])
        return augment_batch_device(dd.gather(idx), jnp.asarray(crops),
                                    jnp.asarray(flips), cfg.input_size,
                                    jnp.asarray(mean), jnp.asarray(std))

    def _eval_resident(self, dd, gid):
        """Eval pixels for resident rows ``gid``: antialiased
        Resize+CenterCrop as two MXU matmuls + normalize, all on device
        (``device_eval.eval_batch_device``); ~1e-6 vs the host oracle."""
        import jax.numpy as jnp  # noqa: PLC0415

        from .device_augment import normalization_constants  # noqa: PLC0415
        from .device_eval import (eval_batch_device,  # noqa: PLC0415
                                  eval_matrices)

        cfg = self.transform
        key = (dd.shape, cfg.resize_size, cfg.input_size)
        cached = getattr(self, "_eval_mats", None)
        if cached is None or cached[0] != key:
            wy, wx = eval_matrices(dd.shape[:2], cfg)
            mean, std = normalization_constants(cfg, dd.shape[2])
            cached = self._eval_mats = (
                key, jnp.asarray(wy), jnp.asarray(wx), jnp.asarray(mean),
                jnp.asarray(std))
        _, wy, wx, mean, std = cached
        return eval_batch_device(dd.gather(gid), wy, wx, mean, std)

    def train_batches(self, epoch: int = 0) -> Iterator[Batch]:
        return self._iter("train", True, epoch)

    def val_batches(self) -> Iterator[Batch]:
        return self._iter("val", False, 0)

    def test_batches(self) -> Iterator[Batch]:
        return self._iter("test", False, 0)

    def split_size(self, split: str) -> int:
        return len(self._splits[split].images)


class SyntheticDataModule(ArrayDataModule):
    """Deterministic synthetic texture-classification data.

    Class k is a sinusoidal grating with class-dependent frequency and
    orientation plus noise — learnable in a couple of epochs, making it the
    smoke-train and benchmark workload in this offline environment.
    """

    def __init__(self, num_classes: int = 4, num_samples: int = 256,
                 image_size: int = 64, num_input_channels: int = 3,
                 batch_size=32, seed: int = 42, **kw):
        transform = kw.pop("transform", TransformConfig(
            resize_size=image_size, input_size=image_size,
            mean=(0.5,) * num_input_channels, std=(0.5,) * num_input_channels,
            scale_range=(0.9, 1.0)))
        super().__init__(num_classes, batch_size, transform=transform,
                         seed=seed, num_input_channels=num_input_channels, **kw)
        self.num_samples = num_samples
        self.image_size = image_size

    def setup(self, stage: Optional[str] = None) -> None:
        if self._splits:
            return
        rng = np.random.default_rng(self.split_seed)
        s, c = self.image_size, self.num_input_channels
        yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        images, labels = [], []
        for i in range(self.num_samples):
            k = i % self.num_classes
            freq = 0.15 + 0.2 * k
            theta = np.pi * k / self.num_classes + rng.normal(0, 0.08)
            phase = rng.uniform(0, 2 * np.pi)
            wave = np.sin(freq * (np.cos(theta) * xx + np.sin(theta) * yy)
                          + phase)
            img = 0.5 + 0.35 * wave[..., None] + rng.normal(0, 0.15, (s, s, c))
            images.append(np.clip(img, 0, 1).astype(np.float32))
            labels.append(k)
        images = np.stack(images)
        labels = np.asarray(labels, np.int64)
        n = len(images)
        n_train, n_val = int(0.7 * n), int(0.15 * n)
        self._splits = {
            "train": _Split(list(images[:n_train]), labels[:n_train]),
            "val": _Split(list(images[n_train:n_train + n_val]),
                          labels[n_train:n_train + n_val]),
            "test": _Split(list(images[n_train + n_val:]),
                           labels[n_train + n_val:]),
        }


class FolderDataModule(ArrayDataModule):
    """Class-subfolder image tree: ``data_dir/<class_name>/*.{jpg,png,tif}``.

    The layout of UCMerced/RESISC45/PlantVillage/GTOS-Mobile distributions.
    Stratified 70/10/20 split with a fixed seed (the reference's
    sugarcane module convention, ``DataModules.py:145-209``).
    """

    dataset_name = "folder"

    @property
    def download_url(self) -> Optional[str]:
        """Archive URL used by ``prepare_data`` on networked machines:
        the ``NFP_TPU_URL_<DATASET>`` env override, else the built-in
        ``DATASET_URLS`` entry for ``dataset_name`` (``data/download.py``);
        ``None`` → manual placement only (docs/DATASETS.md)."""
        from .download import dataset_url  # noqa: PLC0415

        return dataset_url(self.dataset_name)

    def __init__(self, data_dir: str, num_classes: Optional[int] = None,
                 resize_size: int = 256, input_size: int = 224,
                 batch_size=32, num_workers: int = 0, seed: int = 42,
                 split: Tuple[float, float, float] = (0.7, 0.1, 0.2), **kw):
        transform = kw.pop("transform", TransformConfig(
            resize_size=resize_size, input_size=input_size))
        super().__init__(num_classes or 0, batch_size, num_workers,
                         transform, seed, **kw)
        self.data_dir = data_dir
        self.split = split
        self.class_names: List[str] = []

    def prepare_data(self) -> None:
        """Download+extract the dataset when absent and the network is
        reachable (the reference's lifecycle, ``DataModules.py:42-44``);
        stays a no-op offline. Also resolves ``data_dir`` to the class-folder
        root inside an already-extracted archive (e.g. UCMerced unzips to
        ``UCMerced_LandUse/Images/``), including the default download
        destination, so a previously-downloaded tree is found offline and
        never re-extracted. Multi-process: downloads per
        ``is_download_leader`` (every host by default; rank 0 only on
        shared filesystems), and EVERY process joins the barrier on EVERY
        exit path — per-process early returns (data already present on one
        host, a flaky network probe) must not strand peers at the
        barrier."""
        from .download import (download_barrier, download_file,
                               extract_archive, find_class_root,
                               is_download_leader, network_available)

        try:
            dest = self.data_dir or os.path.join("data", self.dataset_name)
            if os.path.isdir(dest):
                root = find_class_root(dest)
                if root:
                    self.data_dir = root
                    return
            if not self.download_url or not network_available():
                return  # offline: setup() raises with guidance
            if is_download_leader():
                archive = download_file(
                    self.download_url,
                    os.path.join(dest,
                                 os.path.basename(self.download_url)
                                 .split("?")[0]))
                extract_archive(archive, dest)
            root = find_class_root(dest)
            if root:
                self.data_dir = root
                self._validate_class_tree(root)
        finally:
            download_barrier()

    def _validate_class_tree(self, root: str) -> None:
        """Structure check after a download+extract: the mirrors for the
        round-4 datasets carry no published md5 (zero-egress container —
        see ``data/download.py::DATASET_URLS``), so verify the extracted
        tree has the declared class count instead. Mismatches warn rather
        than fail: PlantVillage mirrors legitimately ship 39 folders (38 +
        ``Background_without_leaves``) and the module adapts."""
        if not self.num_classes:
            return
        try:
            found = sum(
                os.path.isdir(os.path.join(root, d))
                for d in os.listdir(root))
        except OSError:
            return
        if found != self.num_classes:
            print(f"{type(self).__name__}: extracted tree has {found} "
                  f"class folders (expected {self.num_classes}); "
                  f"proceeding with the tree as-is")

    #: immediate-subdir names marking a pre-split distribution root
    #: (e.g. GTOS-Mobile ships ``gtos-mobile/{train,test}/<class>/*.jpg``,
    #: pytorch-material-classification layout). Such trees are MERGED and
    #: re-split 70/10/20 with the fixed seed — the reference's protocol —
    #: instead of silently scanning only one branch.
    _SPLIT_DIR_NAMES = ("train", "test", "val", "validation")

    def _class_roots(self) -> List[str]:
        """The directories whose children are class folders: ``data_dir``
        itself, or — when every immediate subdir is named like a split —
        each of those split subdirs (merged scan)."""
        subdirs = sorted(
            d for d in os.listdir(self.data_dir)
            if os.path.isdir(os.path.join(self.data_dir, d)))
        if subdirs and all(d.lower() in self._SPLIT_DIR_NAMES
                           for d in subdirs):
            return [os.path.join(self.data_dir, d) for d in subdirs]
        return [self.data_dir]

    def _scan(self) -> Tuple[List[str], List[int]]:
        if not self.data_dir or not os.path.isdir(self.data_dir):
            hint = (f"prepare_data() downloads it on networked machines"
                    if self.download_url else
                    f"no public download URL exists for {self.dataset_name}")
            raise FileNotFoundError(
                f"{type(self).__name__}: data_dir {self.data_dir!r} not "
                f"found ({hint}); provide a class-subfolder tree or use "
                f"--dataset synthetic.")
        roots = self._class_roots()
        classes = sorted({
            d for root in roots for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))})
        paths, labels = [], []
        for li, cls in enumerate(classes):
            for root in roots:
                cdir = os.path.join(root, cls)
                if not os.path.isdir(cdir):
                    continue
                for fn in sorted(os.listdir(cdir)):
                    if fn.lower().endswith(_IMG_EXTS):
                        paths.append(os.path.join(cdir, fn))
                        labels.append(li)
        if not paths:
            raise FileNotFoundError(
                f"{type(self).__name__}: no images under {self.data_dir!r}")
        self.class_names = classes
        return paths, labels

    def setup(self, stage: Optional[str] = None) -> None:
        if self._splits:
            return
        paths, labels = self._scan()
        labels = np.asarray(labels, np.int64)
        if not self.num_classes:
            self.num_classes = int(labels.max()) + 1
        rng = np.random.default_rng(self.split_seed)
        tr_idx, va_idx, te_idx = [], [], []
        for c in range(self.num_classes):
            idx = np.where(labels == c)[0]
            rng.shuffle(idx)
            n = len(idx)
            n_tr = int(self.split[0] * n)
            n_va = int(self.split[1] * n)
            tr_idx.extend(idx[:n_tr])
            va_idx.extend(idx[n_tr:n_tr + n_va])
            te_idx.extend(idx[n_tr + n_va:])
        mk = lambda ids: _Split([paths[i] for i in ids], labels[list(ids)])  # noqa: E731
        self._splits = {"train": mk(tr_idx), "val": mk(va_idx),
                        "test": mk(te_idx)}


class UCMercedDataModule(FolderDataModule):
    """UCMerced LandUse, 21 classes, 256px TIFFs (``demo.py:88-95``)."""

    dataset_name = "UCMerced"

    def __init__(self, resize_size=256, input_size=224, data_dir=None,
                 batch_size=32, num_workers: int = 0, **kw):
        super().__init__(data_dir, 21, resize_size, input_size, batch_size,
                         num_workers, **kw)


class RESISC45DataModule(FolderDataModule):
    """NWPU-RESISC45, 45 classes (``demo.py:96-103``)."""

    dataset_name = "RESISC45"

    def __init__(self, resize_size=256, input_size=224, data_dir=None,
                 batch_size=32, num_workers: int = 0, **kw):
        super().__init__(data_dir, 45, resize_size, input_size, batch_size,
                         num_workers, **kw)


class GTOSMobileDataModule(FolderDataModule):
    """GTOS-Mobile ground-terrain dataset, 31 classes; exposes
    ``num_classes`` after setup (``demo.py:120-127``)."""

    dataset_name = "GTOS-Mobile"

    def __init__(self, batch_size=32, num_workers: int = 0, data_dir=None,
                 resize_size=256, input_size=224, **kw):
        super().__init__(data_dir, 31, resize_size, input_size, batch_size,
                         num_workers, **kw)


class PlantVillageDataModule(FolderDataModule):
    """PlantVillage leaf-disease dataset, 38 classes (``demo.py:128-136``;
    the reference's Params table says 15 — a documented inconsistency, we use
    the CLI table's 38 and adapt to whatever the folder tree holds)."""

    dataset_name = "PlantVillage"

    def __init__(self, batch_size=32, num_workers: int = 0, data_dir=None,
                 resize_size=256, input_size=224, **kw):
        super().__init__(data_dir, None, resize_size, input_size, batch_size,
                         num_workers, **kw)


class EuroSATDataModule(FolderDataModule):
    """EuroSAT, 10 classes. The multispectral distribution is 13-band
    GeoTIFF; decoding uses tifffile/PIL multi-band support. RGB JPEG
    distributions work out of the box (``demo.py:137-144, 224-228``)."""

    dataset_name = "EuroSAT"

    @property
    def download_url(self):  # 13-band Sentinel-2 GeoTIFFs vs the RGB JPEGs
        from .download import dataset_url

        return dataset_url("EuroSAT_ms" if self.num_input_channels > 3
                           else "EuroSAT_rgb")

    def __init__(self, resize_size=64, input_size=64, data_dir=None,
                 batch_size=32, num_workers: int = 0, bands: int = 13, **kw):
        kw.setdefault("transform", TransformConfig(
            resize_size=resize_size, input_size=input_size,
            mean=(0.5,), std=(0.5,)))
        super().__init__(data_dir, 10, resize_size, input_size, batch_size,
                         num_workers, **kw)
        self.num_input_channels = bands

    def _decode(self, item) -> np.ndarray:
        if isinstance(item, np.ndarray):
            return item
        if str(item).lower().endswith((".tif", ".tiff")):
            arr = _read_multiband_tiff(str(item))
            if arr is not None:
                # scale by source dtype: uint8 images are 0-255; uint16
                # EuroSAT tiles are Sentinel-2 reflectance (0-10000 typical)
                if arr.dtype == np.uint8:
                    arr = arr.astype(np.float32) / 255.0
                elif np.issubdtype(arr.dtype, np.integer):
                    arr = arr.astype(np.float32) / 10000.0
                else:
                    arr = arr.astype(np.float32)
                if arr.shape[2] != self.num_input_channels:
                    arr = _adapt_bands(arr, self.num_input_channels)
                return np.clip(arr, 0.0, 1.0)
        img = super()._decode(item)
        if img.shape[2] != self.num_input_channels:
            img = _adapt_bands(img, self.num_input_channels)
        return img


def _read_multiband_tiff(path: str) -> Optional[np.ndarray]:
    """Best-effort multi-band TIFF decode (rasterio is not in this image)."""
    try:
        import tifffile  # noqa: PLC0415

        arr = tifffile.imread(path)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.ndim == 3 and arr.shape[0] < arr.shape[2]:  # CHW -> HWC
            arr = np.transpose(arr, (1, 2, 0))
        return arr
    except Exception:
        return None


def _adapt_bands(img: np.ndarray, bands: int) -> np.ndarray:
    """Repeat/truncate channels, the timm ``in_chans`` adaptation convention."""
    c = img.shape[2]
    if c == bands:
        return img
    reps = int(np.ceil(bands / c))
    return np.concatenate([img] * reps, axis=2)[:, :, :bands]


class MSTARDataModule(FolderDataModule):
    """MSTAR SAR target chips, 6 classes (``demo.py:104-111``; the reference
    registry references a datamodule that was never shipped — NameError)."""

    dataset_name = "MSTAR"

    def __init__(self, resize_size=128, input_size=128, data_dir=None,
                 batch_size=32, num_workers: int = 0, **kw):
        super().__init__(data_dir, 6, resize_size, input_size, batch_size,
                         num_workers, **kw)


class SugarcaneDamageUSADataModule(FolderDataModule):
    """sugarcane_damage_usa (AgML), 70/10/20 split
    (``DataModules.py:145-209``; AgML is not in this image, so this reads the
    extracted class-subfolder tree)."""

    dataset_name = "sugarcane_damage_usa"

    def __init__(self, resize_size=256, input_size=224, data_dir=None,
                 batch_size=32, num_workers: int = 0, **kw):
        super().__init__(data_dir, None, resize_size, input_size, batch_size,
                         num_workers, split=(0.7, 0.1, 0.2), **kw)


class CIFAR10DataModule(ArrayDataModule):
    """CIFAR-10 from a local ``cifar-10-batches-py`` tree
    (``DataModules.py:79-143``: 70/30 train/val split, test truncated to 100
    samples — truncation replicated for parity)."""

    def __init__(self, resize_size=36, input_size=32, data_dir=None,
                 batch_size=32, num_workers: int = 0, **kw):
        transform = kw.pop("transform", TransformConfig(
            resize_size=resize_size, input_size=input_size,
            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)))
        super().__init__(10, batch_size, num_workers, transform, **kw)
        self.data_dir = data_dir

    def prepare_data(self) -> None:
        """torchvision-layout download (``DataModules.py:85-88``): fetch
        ``cifar-10-python.tar.gz`` and extract ``cifar-10-batches-py`` when
        absent and the network is reachable."""
        from .download import (DATASET_URLS, download_barrier, download_file,
                               extract_archive, is_download_leader,
                               network_available)

        try:
            dest = self.data_dir or "data"
            if os.path.isdir(os.path.join(dest, "cifar-10-batches-py")):
                return
            if not network_available():
                return
            if is_download_leader():
                tar = download_file(
                    DATASET_URLS["cifar10"],
                    os.path.join(dest, "cifar-10-python.tar.gz"))
                extract_archive(tar, dest)
        finally:
            # every process joins on every exit path (a per-process early
            # return must not strand peers at the barrier)
            download_barrier()

    def setup(self, stage: Optional[str] = None) -> None:
        if self._splits:
            return
        import pickle

        root = os.path.join(self.data_dir or "data", "cifar-10-batches-py")
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"CIFAR10DataModule: {root} not found (prepare_data() "
                f"downloads it on networked machines; offline, use "
                f"--dataset synthetic)")
        xs, ys = [], []
        for i in range(1, 6):
            with open(os.path.join(root, f"data_batch_{i}"), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"])
            ys.extend(d[b"labels"])
        # splits hold uint8 rows (the decode convention: 4x less RAM and
        # host->device transfer; to_float01 restores the exact float pixels)
        x = np.ascontiguousarray(
            np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        y = np.asarray(ys, np.int64)
        rng = np.random.default_rng(self.split_seed)
        order = rng.permutation(len(x))
        x, y = x[order], y[order]
        n_tr = int(0.7 * len(x))
        with open(os.path.join(root, "test_batch"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xt = np.ascontiguousarray(
            d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)[:100])
        yt = np.asarray(d[b"labels"], np.int64)[:100]
        self._splits = {
            "train": _Split(list(x[:n_tr]), y[:n_tr]),
            "val": _Split(list(x[n_tr:]), y[n_tr:]),
            "test": _Split(list(xt), yt),
        }


class FashionMNISTDataModule(ArrayDataModule):
    """FashionMNIST from local IDX files (``DataModules.py:16-77``:
    80/20 split, seed 42, 1→3 channel repeat for pretrained backbones)."""

    def __init__(self, resize_size=36, input_size=32, data_dir=None,
                 batch_size=32, num_workers: int = 0, **kw):
        transform = kw.pop("transform", TransformConfig(
            resize_size=resize_size, input_size=input_size,
            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)))
        super().__init__(10, batch_size, num_workers, transform, **kw)
        self.data_dir = data_dir

    @staticmethod
    def _read_idx(path: str) -> np.ndarray:
        import gzip

        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rb") as f:
            data = f.read()
        magic = int.from_bytes(data[:4], "big")
        ndim = magic & 0xFF
        dims = [int.from_bytes(data[4 + i * 4: 8 + i * 4], "big")
                for i in range(ndim)]
        return np.frombuffer(data, np.uint8,
                             offset=4 + 4 * ndim).reshape(dims)

    _IDX_FILES = ("train-images-idx3-ubyte", "train-labels-idx1-ubyte",
                  "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte")

    def prepare_data(self) -> None:
        """torchvision-layout IDX download (``DataModules.py:42-44``)."""
        from .download import (DATASET_URLS, download_barrier, download_file,
                               is_download_leader, network_available)

        try:
            root = os.path.join(self.data_dir or "data", "FashionMNIST",
                                "raw")
            if all(os.path.exists(os.path.join(root, n))
                   or os.path.exists(os.path.join(root, n + ".gz"))
                   for n in self._IDX_FILES):
                return
            if not network_available():
                return
            if is_download_leader():
                for name in self._IDX_FILES:
                    download_file(
                        DATASET_URLS["fashionmnist_base"] + name + ".gz",
                        os.path.join(root, name + ".gz"))
        finally:
            # every process joins on every exit path (a per-process early
            # return must not strand peers at the barrier)
            download_barrier()

    def setup(self, stage: Optional[str] = None) -> None:
        if self._splits:
            return
        root = os.path.join(self.data_dir or "data", "FashionMNIST", "raw")
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"FashionMNISTDataModule: {root} not found (prepare_data() "
                f"downloads it on networked machines; offline, use "
                f"--dataset synthetic)")

        def load(name):
            for suffix in ("", ".gz"):
                p = os.path.join(root, name + suffix)
                if os.path.exists(p):
                    return self._read_idx(p)
            raise FileNotFoundError(name)

        # uint8 splits (see CIFAR10: 4x less RAM, identical float pixels)
        x = np.repeat(load("train-images-idx3-ubyte")[..., None], 3, axis=-1)
        y = load("train-labels-idx1-ubyte").astype(np.int64)
        rng = np.random.default_rng(42)  # DataModules.py:61
        order = rng.permutation(len(x))
        x, y = x[order], y[order]
        n_tr = int(0.8 * len(x))
        xt = np.repeat(load("t10k-images-idx3-ubyte")[..., None], 3, axis=-1)
        yt = load("t10k-labels-idx1-ubyte").astype(np.int64)
        self._splits = {
            "train": _Split(list(x[:n_tr]), y[:n_tr]),
            "val": _Split(list(x[n_tr:]), y[n_tr:]),
            "test": _Split(list(xt), yt),
        }


def get_datamodule(dataset: str, config: Dict) -> DataModule:
    """Dataset registry mirroring ``demo.py:87-146`` (+ synthetic)."""
    dm = _build_datamodule(dataset, config)
    dm.use_device_augment = bool(config.get("device_augment", False))
    dm.use_device_data = bool(config.get("device_data", False))
    dm.use_device_eval = bool(config.get("device_eval", False))
    return dm


def _build_datamodule(dataset: str, config: Dict) -> DataModule:
    common = dict(
        resize_size=config.get("resize_size", 256),
        input_size=config.get("input_size", 224),
        data_dir=config.get("data_dir"),
        batch_size=config.get("batch_size", 32),
        num_workers=config.get("num_workers", 0),
        seed=config.get("seed", 42),
    )
    if dataset == "UCMerced":
        return UCMercedDataModule(**common)
    if dataset == "RESISC45":
        return RESISC45DataModule(**common)
    if dataset == "GTOS-Mobile":
        return GTOSMobileDataModule(**common)
    if dataset == "PlantVillage":
        return PlantVillageDataModule(**common)
    if dataset == "EuroSAT":
        return EuroSATDataModule(
            bands=config.get("num_input_channels", 13), **common)
    if dataset == "MSTAR":
        return MSTARDataModule(**common)
    if dataset == "sugarcane_damage_usa":
        return SugarcaneDamageUSADataModule(**common)
    if dataset == "cifar10":
        return CIFAR10DataModule(**common)
    if dataset == "FashionMNIST":
        return FashionMNISTDataModule(**common)
    if dataset == "synthetic":
        return SyntheticDataModule(
            num_classes=config.get("num_classes", 4),
            num_samples=config.get("num_samples", 256),
            image_size=config.get("input_size", 64),
            num_input_channels=config.get("num_input_channels", 3),
            batch_size=config.get("batch_size", 32),
            seed=config.get("seed", 42))
    raise ValueError(f"Unknown dataset: {dataset}")
