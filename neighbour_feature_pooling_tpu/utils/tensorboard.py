"""Dependency-free TensorBoard event-file writer.

The reference wires a ``TensorBoardLogger`` into every run
(``/root/reference/demo.py:400-403, 408``) and logs scalar metrics each
step/epoch (``Lightning_Wrapper.py:99-103``). This container has no
``tensorboard`` package, so this module writes the on-disk format directly:

* a TFRecord stream (`length:uint64 | masked-crc32c(length) | payload |
  masked-crc32c(payload)`) of hand-encoded ``tensorflow.Event`` protobuf
  messages — only the three fields scalar summaries need (``wall_time``,
  ``step``, ``summary.value{tag, simple_value}``), which is stable wire
  format since TF 1.x;
* standard file naming ``events.out.tfevents.<wall_time>.<hostname>`` under
  the log dir, so ``tensorboard --logdir`` picks runs up unmodified.

crc32c is the Castagnoli CRC with TFRecord's rotate-and-add masking.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
from typing import Optional

__all__ = ["SummaryWriter", "crc32c", "masked_crc"]


def _make_crc32c_table():
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    """TFRecord CRC mask: rotate right by 15 and add a constant."""
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------- protobuf

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_bytes(num: int, payload: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(payload)) + payload


def _field_double(num: int, v: float) -> bytes:
    return _varint(num << 3 | 1) + struct.pack("<d", v)


def _field_float(num: int, v: float) -> bytes:
    return _varint(num << 3 | 5) + struct.pack("<f", v)


def _field_varint(num: int, v: int) -> bytes:
    return _varint(num << 3 | 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _scalar_event(tag: str, value: float, step: int, wall_time: float) -> bytes:
    # Summary.Value{ tag=1:string, simple_value=2:float }
    sv = _field_bytes(1, tag.encode()) + _field_float(2, float(value))
    summary = _field_bytes(1, sv)          # Summary.value = 1 (repeated)
    return (_field_double(1, wall_time)    # Event.wall_time = 1
            + _field_varint(2, int(step))  # Event.step = 2
            + _field_bytes(5, summary))    # Event.summary = 5


def _version_event(wall_time: float) -> bytes:
    return (_field_double(1, wall_time)
            + _field_bytes(3, b"brain.Event:2"))  # Event.file_version = 3


# ------------------------------------------------------------------ writer

class SummaryWriter:
    """Minimal ``torch.utils.tensorboard.SummaryWriter`` work-alike
    (scalars only). Thread-safe; appends are buffered and flushed on
    ``flush()``/``close()`` and every ``flush_secs``."""

    def __init__(self, logdir: str, flush_secs: float = 30.0):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        t = time.time()
        fname = f"events.out.tfevents.{t:.0f}.{socket.gethostname()}"
        self._path = os.path.join(logdir, fname)
        self._file = open(self._path, "ab")
        self._lock = threading.Lock()
        self._flush_secs = flush_secs
        self._last_flush = t
        self._write_record(_version_event(t))

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._file.write(header)
        self._file.write(struct.pack("<I", masked_crc(header)))
        self._file.write(payload)
        self._file.write(struct.pack("<I", masked_crc(payload)))

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: Optional[float] = None) -> None:
        wt = time.time() if wall_time is None else wall_time
        with self._lock:
            self._write_record(_scalar_event(tag, value, step, wt))
            if wt - self._last_flush >= self._flush_secs:
                self._file.flush()
                self._last_flush = wt

    def flush(self) -> None:
        with self._lock:
            self._file.flush()

    def close(self) -> None:
        with self._lock:
            if not self._file.closed:
                self._file.flush()
                self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_scalar_events(path: str):
    """Parse a scalar-only event file back into ``[(step, tag, value)]``.

    Test/verification helper (and the documented jsonl-free way to check a
    run's curves without installing tensorboard). Verifies TFRecord CRCs;
    a TRUNCATED tail (run killed mid-write) is treated as end-of-file with
    a warning, like TensorBoard's own reader, while a corrupt complete
    record still raises ``ValueError``.
    """
    import warnings

    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                if header:
                    warnings.warn(f"{path}: truncated record header at EOF")
                break
            (n,) = struct.unpack("<Q", header)
            hcrc_bytes = f.read(4)
            if len(hcrc_bytes) < 4:
                warnings.warn(f"{path}: truncated record at EOF")
                break
            (hcrc,) = struct.unpack("<I", hcrc_bytes)
            if hcrc != masked_crc(header):
                raise ValueError("corrupt record header (crc mismatch)")
            payload = f.read(n)
            pcrc_bytes = f.read(4)
            if len(payload) < n or len(pcrc_bytes) < 4:
                warnings.warn(f"{path}: truncated record at EOF")
                break
            (pcrc,) = struct.unpack("<I", pcrc_bytes)
            if pcrc != masked_crc(payload):
                raise ValueError("corrupt record payload (crc mismatch)")
            out.extend(_parse_event(payload))
    return out


def _read_varint(buf: bytes, i: int):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _parse_fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        num, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
        elif wire == 1:
            val, i = buf[i:i + 8], i + 8
        elif wire == 2:
            n, i = _read_varint(buf, i)
            val, i = buf[i:i + n], i + n
        elif wire == 5:
            val, i = buf[i:i + 4], i + 4
        else:  # pragma: no cover - never emitted by this writer
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, val


def _parse_event(payload: bytes):
    step = 0
    values = []
    for num, wire, val in _parse_fields(payload):
        if num == 2 and wire == 0:
            step = val
        elif num == 5 and wire == 2:  # summary
            for n2, w2, v2 in _parse_fields(val):
                if n2 == 1 and w2 == 2:  # Summary.value
                    tag, sv = None, None
                    for n3, w3, v3 in _parse_fields(v2):
                        if n3 == 1 and w3 == 2:
                            tag = v3.decode()
                        elif n3 == 2 and w3 == 5:
                            (sv,) = struct.unpack("<f", v3)
                    if tag is not None and sv is not None:
                        values.append((step, tag, sv))
    return values
