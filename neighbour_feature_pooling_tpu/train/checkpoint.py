"""Checkpointing: best-by-val_acc + last, the reference's ModelCheckpoint
policy (``/root/reference/demo.py:381-392``), backed by Orbax with a
msgpack fallback.

Layout: ``{ckpt_dir}/best`` and ``{ckpt_dir}/last``, each holding the full
train state (params, batch_stats, opt_state, step) plus a small metadata
dict (epoch, val_acc, val_loss).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "restore_for_inference"]


def _tree_state(state) -> Dict[str, Any]:
    return {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state}


def save_checkpoint(path: str, state, metadata: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = jax.device_get(_tree_state(state))
    orbax_path = os.path.abspath(path) + ".orbax"
    msgpack_path = path + ".msgpack"
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(orbax_path, tree, force=True)
        ckptr.wait_until_finished()
        # remove a stale artifact from the other backend so restore (which
        # prefers orbax) can never pick up an older save
        if os.path.exists(msgpack_path):
            os.remove(msgpack_path)
    except Exception:
        import shutil

        import flax.serialization

        with open(msgpack_path, "wb") as f:
            f.write(flax.serialization.to_bytes(tree))
        if os.path.isdir(orbax_path):
            shutil.rmtree(orbax_path, ignore_errors=True)
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f)


def restore_checkpoint(path: str, state):
    """Restore a state saved by :func:`save_checkpoint` into ``state``."""
    tree = jax.device_get(_tree_state(state))
    orbax_path = os.path.abspath(path) + ".orbax"
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(orbax_path, tree)
    else:
        import flax.serialization

        with open(path + ".msgpack", "rb") as f:
            restored = flax.serialization.from_bytes(tree, f.read())
    meta = {}
    meta_path = path + ".meta.json"
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
    restore requires a matching opt_state pytree)."""
    orbax_path = os.path.abspath(path) + ".orbax"
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(orbax_path)
    else:
        import flax.serialization

        with open(path + ".msgpack", "rb") as f:
            restored = flax.serialization.msgpack_restore(f.read())
    return restored["params"], restored["batch_stats"]
