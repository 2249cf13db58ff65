"""Checkpointing: best-by-val_acc + last, the reference's ModelCheckpoint
policy (``/root/reference/demo.py:381-392``), backed by Orbax with a
msgpack fallback.

Layout: ``{ckpt_dir}/best`` and ``{ckpt_dir}/last``, each holding the full
train state (params, batch_stats, opt_state, step) plus a small metadata
dict (epoch, val_acc, val_loss).

Sharding-aware by design: on a multi-host mesh the orbax path saves the
LIVE ``jax.Array`` leaves, so a ZeRO/FSDP- or tensor-parallel-sharded
state writes shard-by-shard — each process contributes only its
addressable shards (orbax coordinates the write; all processes must call
:func:`save_checkpoint`, see :func:`needs_collective_save`).
Fully-addressable (single-host) states are pulled to host on the
caller's thread first — through the axon TPU relay, device reads from
orbax's background thread deadlock once the main thread parks in
``wait_until_finished`` (see the inline note in :func:`save_checkpoint`).
Restore goes straight back into the state's placement: the target tree
carries each leaf's ``jax.sharding.Sharding``, so a resumed FSDP run
never materializes the full state on one host. The msgpack fallback
remains for environments without orbax — single-host only (it must
gather).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "restore_for_inference",
           "needs_collective_save", "wait_for_saves"]

# In-flight async saves: orbax_path -> (checkpointer, msgpack_path,
# meta_path, metadata). Orbax's StandardCheckpointer is async-native (the
# blocking part is only serializing device shards to host; the filesystem
# write + commit-rename runs on a background thread), so a ``block=False``
# save overlaps checkpoint IO with the next training epoch. Metadata is
# deferred to the matching :func:`wait_for_saves` so ``meta.json`` is
# never NEWER than the data it describes (a crash mid-write then leaves
# the previous checkpoint + previous metadata, and resume at worst
# re-runs one epoch — never skips one).
_INFLIGHT: Dict[str, Tuple[Any, str, str, Optional[Dict]]] = {}


def wait_for_saves(path: Optional[str] = None) -> None:
    """Block until pending async saves are durable (all of them, or just
    ``path``'s), then finalize their deferred metadata writes."""
    import contextlib

    for orbax_path in list(_INFLIGHT):
        if path is not None and orbax_path != os.path.abspath(path) + ".orbax":
            continue
        ckptr, msgpack_path, meta_path, metadata = _INFLIGHT.pop(orbax_path)
        ckptr.wait_until_finished()
        try:
            ckptr.close()  # free the background thread pool (long runs
        except Exception:  # make one checkpointer per epoch per path)
            pass
        # remove a stale artifact from the other backend so restore (which
        # prefers orbax) can never pick up an older save; suppress the
        # collective-save race where a peer process unlinks it first
        with contextlib.suppress(FileNotFoundError):
            os.remove(msgpack_path)
        if metadata is not None and _is_leader():
            with open(meta_path, "w") as f:
                json.dump(metadata, f)


def _tree_state(state) -> Dict[str, Any]:
    return {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state}


def needs_collective_save(state) -> bool:
    """True when some leaf's shards span processes this one cannot
    address — then EVERY process must call :func:`save_checkpoint`
    (orbax writes collectively); a leader-only call would deadlock or
    drop shards. Single-host states always return False."""
    return any(isinstance(x, jax.Array) and not x.is_fully_addressable
               for x in jax.tree_util.tree_leaves(_tree_state(state)))


def _is_leader() -> bool:
    try:
        from ..parallel.dist import is_io_leader

        return is_io_leader()
    except Exception:
        return True


def save_checkpoint(path: str, state, metadata: Optional[Dict] = None,
                    block: bool = True) -> None:
    """Save the train state to ``path`` (+ ``.orbax``/``.msgpack``).

    ``block=False`` returns once device shards are serialized to host;
    the filesystem write and the commit rename continue on orbax's
    background thread, and the metadata write is deferred with them.
    A later :func:`save_checkpoint`/:func:`restore_checkpoint` on the
    same path (or :func:`wait_for_saves`) flushes the pending save
    first. On a multi-host mesh EVERY process must make the same
    save/flush calls (the write is collective)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = _tree_state(state)
    if not needs_collective_save(state):
        # Fully-addressable (single-host) states: pull the shards to host
        # HERE, on the caller's thread, before handing to orbax. Through
        # the axon TPU relay, device reads issued from orbax's background
        # thread deadlock when the main thread then parks in
        # wait_until_finished (the relay's completions need the main
        # thread inside JAX calls) — observed as an un-finalized
        # .orbax-checkpoint-tmp and every thread in futex_wait at the end
        # of fit. Host trees make the background write pure file IO.
        # Multi-host states keep their LIVE arrays: each process hands
        # orbax its addressable shards and the write stays collective
        # (CPU/pod contexts, where background device reads are safe).
        tree = jax.device_get(tree)
    # every sibling path is anchored to the abspath captured NOW: the
    # deferred-metadata flush may run after a chdir
    apath = os.path.abspath(path)
    orbax_path = apath + ".orbax"
    msgpack_path = apath + ".msgpack"
    meta_path = apath + ".meta.json"
    try:
        # one in-flight save per path; a deferred failure of the PREVIOUS
        # async write surfaces here and takes the same fallback as a
        # blocking-save failure would
        wait_for_saves(path)
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # single-host: host-numpy tree (pulled above), pure file IO from
        # here; multi-host: live arrays, orbax writes per-shard
        # collectively with no host gather
        ckptr.save(orbax_path, tree, force=True)
        _INFLIGHT[orbax_path] = (ckptr, msgpack_path, meta_path, metadata)
        if block:
            wait_for_saves(path)
        return
    except Exception:
        _INFLIGHT.pop(orbax_path, None)
        if needs_collective_save(state):
            raise RuntimeError(
                "orbax save failed for a multi-host-sharded state; the "
                "msgpack fallback cannot gather non-addressable shards")
        import shutil

        import flax.serialization

        with open(msgpack_path, "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(tree)))
        if os.path.isdir(orbax_path):
            shutil.rmtree(orbax_path, ignore_errors=True)
    if metadata is not None and _is_leader():
        with open(meta_path, "w") as f:
            json.dump(metadata, f)


def checkpoint_exists(path: str) -> bool:
    """True if ``path`` has a restorable checkpoint (orbax dir or msgpack)."""
    apath = os.path.abspath(path)
    return os.path.isdir(apath + ".orbax") or os.path.exists(
        apath + ".msgpack")


def _restore_target(tree):
    """Abstract restore target preserving each live leaf's sharding, so
    orbax loads shards directly onto their owning devices."""

    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return x

    return jax.tree_util.tree_map(leaf, tree)


def restore_checkpoint(path: str, state):
    """Restore a state saved by :func:`save_checkpoint` into ``state``,
    onto ``state``'s existing shardings (resharding on load if the
    checkpoint was written under a different mesh layout)."""
    wait_for_saves(path)
    tree = _tree_state(state)
    apath = os.path.abspath(path)
    orbax_path = apath + ".orbax"
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(orbax_path, _restore_target(tree))
    else:
        if needs_collective_save(state):
            raise RuntimeError(
                "only a msgpack checkpoint exists at "
                f"{apath!r}, and the msgpack path cannot restore into a "
                "multi-host-sharded state (it must gather the target on "
                "one host); re-save with orbax available")
        import flax.serialization

        with open(apath + ".msgpack", "rb") as f:
            restored = flax.serialization.from_bytes(
                jax.device_get(tree), f.read())
    meta = {}
    meta_path = apath + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    new_state = state.replace(
        step=restored["step"], params=restored["params"],
        batch_stats=restored["batch_stats"], opt_state=restored["opt_state"])
    return new_state, meta


def restore_for_inference(path: str):
    """Restore only (params, batch_stats) — structure-free, so checkpoints
    written under ANY optimizer/scheduler configuration load (the full
    restore requires a matching opt_state pytree). Arrays come back as
    host numpy: checkpoints are saved with their live mesh shardings, and
    a targetless orbax restore would try to rebuild the saving topology —
    which the serving host (1 chip, vs the training pod) doesn't have."""
    wait_for_saves(path)
    apath = os.path.abspath(path)
    orbax_path = apath + ".orbax"
    if os.path.isdir(orbax_path):
        import numpy as np
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(orbax_path).item_metadata
        mtree = meta.tree if hasattr(meta, "tree") else meta
        # partial restore: only the serving subtrees are read — the
        # opt_state (2× param bytes of Adam moments) never leaves disk
        wanted = {k: mtree[k] for k in ("params", "batch_stats")}
        restore_args = jax.tree_util.tree_map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), wanted)
        import logging as pylogging

        absl_logger = pylogging.getLogger("absl")
        prev_level = absl_logger.level
        absl_logger.setLevel(pylogging.ERROR)  # orbax warns per-call that
        try:                                   # transforms will be redesigned
            restored = ckptr.restore(
                orbax_path,
                item=jax.tree_util.tree_map(lambda m: 0, wanted),
                restore_args=restore_args, transforms={})
        finally:
            absl_logger.setLevel(prev_level)
    else:
        import flax.serialization

        with open(apath + ".msgpack", "rb") as f:
            restored = flax.serialization.msgpack_restore(f.read())
    return restored["params"], restored["batch_stats"]
