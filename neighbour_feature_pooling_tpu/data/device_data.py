"""Device-resident training data: upload a split once, gather per step.

The reference streams every batch host->device each step (torch DataLoader
into ``.cuda()`` copies, ``/root/reference/demo.py:523``). For the texture
datasets this framework targets (UCMerced 290 MB decoded uint8, CIFAR-10
107 MB, EuroSAT 1.1 GB) the whole decoded training split fits in a corner
of a TPU's HBM — so the TPU-native design uploads it ONCE as uint8 and
performs per-step row gather + crop/resize/flip/normalize entirely on
device (``device_augment.augment_batch_device``). After the one-time
upload, the host sends only shuffled row indices and per-sample crop plans
(a few KB per step): training throughput stops depending on host decode
speed, host->device bandwidth, or worker counts at all.

Chunking: the split is stored as a tuple of <=``chunk_mb`` arrays instead
of one monolith (keeps individual transfers/buffers small — this
container's TPU relay degrades on >100 MB buffers, and real hosts overlap
chunked uploads better). The gather masks each chunk's contribution and
sums — K extra gathers of B rows each, noise next to HBM bandwidth.

Multi-process: every process uploads the full split to its own devices
(a global shuffle can route any row to any process); each then gathers
only its rows of each global batch. HBM cost is duplicated, throughput
is not.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["DeviceSplit", "build_device_split"]


@dataclasses.dataclass
class DeviceSplit:
    """A decoded split resident on the accelerator."""

    chunks: Tuple  # tuple of jax.Array, (n_k, H, W, C), uint8 or float32
    starts: Tuple[int, ...]  # global row index of each chunk's first row
    shape: Tuple[int, int, int]  # (H, W, C) of every image
    n: int
    _gather: Callable = None

    def gather(self, idx: Sequence[int]):
        """Rows ``idx`` (any order, duplicates fine) as one device array."""
        import jax.numpy as jnp

        return self._gather(jnp.asarray(np.asarray(idx, np.int32)),
                            *self.chunks)

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(c.shape)) * c.dtype.itemsize
                   for c in self.chunks)


def _make_gather(starts: Tuple[int, ...], sizes: Tuple[int, ...]):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gather(idx, *chunks):
        out = jnp.zeros((idx.shape[0],) + chunks[0].shape[1:],
                        chunks[0].dtype)
        mask_shape = (-1,) + (1,) * (chunks[0].ndim - 1)
        for ch, st, sz in zip(chunks, starts, sizes):
            loc = idx - st
            valid = ((loc >= 0) & (loc < sz)).reshape(mask_shape)
            rows = ch[jnp.clip(loc, 0, sz - 1)]
            out = jnp.where(valid, rows, out)
        return out

    return gather


def build_device_split(images: List[np.ndarray], chunk_mb: int = 64,
                       budget_mb: int = 4096) -> Optional[DeviceSplit]:
    """Upload decoded images as chunked device arrays; None if ineligible.

    Ineligible when shapes are mixed (mixed-resolution folder datasets
    stream through the host path instead) or the split exceeds
    ``budget_mb`` (don't squeeze training activations out of HBM).
    """
    import jax

    if not images:
        return None
    shape = images[0].shape
    if any(im.shape != shape for im in images):
        return None
    total = sum(im.nbytes for im in images)
    if total > budget_mb * (1 << 20):
        return None
    per = max(1, (chunk_mb * (1 << 20)) // max(images[0].nbytes, 1))
    chunks, starts, sizes = [], [], []
    for s in range(0, len(images), per):
        part = images[s: s + per]
        chunks.append(jax.device_put(np.stack(part)))
        starts.append(s)
        sizes.append(len(part))
    split = DeviceSplit(tuple(chunks), tuple(starts), tuple(shape),
                        len(images))
    split._gather = _make_gather(tuple(starts), tuple(sizes))
    return split
