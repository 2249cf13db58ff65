"""Seed-parallel training: the 3-seed protocol as ONE sharded program.

The reference runs its seeds {42, 123, 999} sequentially in a Python loop
(``/root/reference/demo.py:545-551``) — three full trainings back to back
on one device. On TPU the protocol itself is parallelizable: stack the
seeds on a leading axis, ``vmap`` the train/eval step bodies over it, and
lay the axis out over the device mesh (``Mesh(("seed", "data"))``), so S
independent trainings advance in lockstep inside a single jitted step and
the whole mean±std experiment costs ~one training's wall-clock.

Semantics match the serial protocol run for run:

* per-seed init rng ``PRNGKey(seed)`` and dropout rng ``PRNGKey(seed+1)``
  — identical to ``Trainer`` (``train/trainer.py::init_state``);
* per-seed data order: each seed gets its own datamodule (same fixed
  ``split_seed``, per-run shuffle seed), exactly like the serial loop;
* per-seed EarlyStopping(val_loss, patience, min_delta) — a stopped seed's
  state is frozen with a ``jnp.where`` mask while the others keep
  training, so every seed ends at the state it would have reached alone
  (the lockstep program just keeps spending its lane's FLOPs);
* per-seed best-checkpoint selection on val_acc (max), tracked on device
  and written per seed at the end (``{ckpt_dir}/seed{n}/best``).

Not supported in this mode (falls back to the serial CLI loop):
``plateau`` scheduler (per-seed LR mutation), ``steps_per_dispatch > 1``,
multi-process hosts, per-step TensorBoard scalars.
"""

from __future__ import annotations

import functools
import json
import math
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..train.engine import (create_train_state, eval_step_body,
                            train_step_body)
from ..train.metrics import init_confusion, metrics_from_confusion_np
from .dist import is_io_leader

__all__ = ["seed_parallel_mesh", "SeedParallelRunner"]


def seed_parallel_mesh(n_seeds: int,
                       devices: Optional[Sequence[jax.Device]] = None):
    """2-D ``("seed", "data")`` mesh for S lockstep trainings.

    The seed axis gets ``gcd(S, n_devices)`` devices (every device holds
    whole seeds — no cross-seed collectives exist, so traffic on this axis
    is zero); the rest go to batch data-parallelism *within* each seed.
    Returns ``None`` on a single device (plain vmap, no sharding).
    """
    devices = list(devices) if devices is not None else jax.devices()
    d = len(devices)
    if d <= 1:
        return None
    from jax.sharding import Mesh

    seed_dim = math.gcd(n_seeds, d)
    data_dim = d // seed_dim
    arr = np.asarray(devices[: seed_dim * data_dim]).reshape(seed_dim,
                                                             data_dim)
    return Mesh(arr, ("seed", "data"))


def _stack_trees(trees: List[Any]):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


class SeedParallelRunner:
    """Fit/test driver for S simultaneous seeds of one experiment.

    ``config`` is a ``train.trainer.TrainerConfig`` (its ``seed`` field is
    ignored — ``seeds`` rules); ``datamodules`` must be one per seed,
    constructed with that seed so shuffling matches the serial protocol.
    """

    def __init__(self, model, num_classes: int, seeds: Sequence[int],
                 config, mesh=None, pretrained_backbone=None,
                 init_variables=None):
        if jax.process_count() > 1:
            raise NotImplementedError(
                "seed-parallel mode is single-process; use the serial loop "
                "on multi-host")
        if config.scheduler == "plateau":
            raise NotImplementedError(
                "plateau scheduler mutates per-seed LR; use the serial loop")
        self.model = model
        self.num_classes = num_classes
        self.seeds = list(seeds)
        self.config = config
        self.mesh = mesh
        self.pretrained_backbone = pretrained_backbone
        self.init_variables = init_variables
        self._io_leader = is_io_leader()
        os.makedirs(config.log_dir, exist_ok=True)
        self._metrics_path = os.path.join(config.log_dir, "metrics.jsonl")
        s = len(self.seeds)
        ls = config.label_smoothing

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._state_sh = NamedSharding(mesh, P("seed"))
            self._batch_sh = NamedSharding(mesh, P("seed", "data"))
        else:
            self._state_sh = self._batch_sh = None

        def _vt(states, batch, rngs, frozen):
            return jax.vmap(
                lambda st, b, r: train_step_body(
                    st, b, r, frozen, num_classes, ls))(states, batch, rngs)

        @functools.partial(jax.jit, static_argnames=("frozen",),
                           donate_argnames=("states",))
        def _train(states, batch, rngs, active, frozen=False):
            new_states, loss, cm = _vt(states, batch, rngs, frozen)

            def sel(n, o):
                m = active.reshape(active.shape + (1,) * (n.ndim - 1))
                return jnp.where(m, n, o)

            states = jax.tree_util.tree_map(sel, new_states, states)
            return states, loss, cm

        @jax.jit
        def _eval(states, batch, loss_sum, w_sum, cm):
            ls_, ws, cmu, _ = jax.vmap(
                lambda st, b: eval_step_body(st, b, num_classes, ls))(
                    states, batch)
            return loss_sum + ls_, w_sum + ws, cm + cmu

        @jax.jit
        def _update_best(best, best_acc, best_epoch, states, val_acc,
                         epoch, active):
            improved = (val_acc > best_acc) & active

            def sel(b, n):
                m = improved.reshape(improved.shape + (1,) * (n.ndim - 1))
                return jnp.where(m, n, b)

            new_best = jax.tree_util.tree_map(
                sel, best, {"params": states.params,
                            "batch_stats": states.batch_stats})
            return (new_best, jnp.where(improved, val_acc, best_acc),
                    jnp.where(improved, epoch, best_epoch))

        self._train_step = _train
        self._eval_accum = _eval
        self._update_best = _update_best
        self._n_seeds = s
        self.states = None
        self.best = None

    # ------------------------------------------------------------- helpers

    def _put_batch(self, batches: List[Dict[str, np.ndarray]]):
        shapes = {tuple(b["image"].shape) for b in batches}
        if len(shapes) != 1:
            raise ValueError(f"per-seed batch shapes diverged: {shapes}")
        stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
                   for k in batches[0]}
        if self._batch_sh is not None:
            return {k: jax.device_put(v, self._batch_sh)
                    for k, v in stacked.items()}
        return {k: jnp.asarray(v) for k, v in stacked.items()}

    @staticmethod
    def _zip_streams(iters):
        iters = [iter(it) for it in iters]
        while True:
            row, done = [], 0
            for it in iters:
                try:
                    row.append(next(it))
                except StopIteration:
                    done += 1
            if done == len(iters):
                return
            if done:
                raise RuntimeError(
                    "seed data streams yielded unequal batch counts")
            yield row

    def _init_states(self, sample_stacked, total_steps: int):
        cfg = self.config

        def init_one(rng, image1):
            return create_train_state(
                self.model, rng, {"image": image1},
                cfg.learning_rate, scheduler=cfg.scheduler,
                total_steps=total_steps,
                pretrained_backbone=self.pretrained_backbone,
                init_variables=self.init_variables)

        keys = jnp.stack([jax.random.PRNGKey(s) for s in self.seeds])
        fn = jax.vmap(init_one)
        if self._state_sh is not None:
            fn = jax.jit(fn, out_shardings=self._state_sh)
        else:
            fn = jax.jit(fn)
        self.states = fn(keys, sample_stacked["image"][:, :1])
        return self.states

    def _per_seed_metrics(self, loss_sum, w_sum, cm) -> List[Dict[str, float]]:
        loss_sum, w_sum, cm = jax.device_get((loss_sum, w_sum, cm))
        out = []
        for i in range(self._n_seeds):
            m = {k: float(v)
                 for k, v in metrics_from_confusion_np(cm[i]).items()}
            m["loss"] = float(loss_sum[i]) / max(float(w_sum[i]), 1.0)
            out.append(m)
        return out

    def _log(self, record: Dict[str, Any]) -> None:
        if self._io_leader:
            with open(self._metrics_path, "a") as f:
                f.write(json.dumps(record) + "\n")

    # ----------------------------------------------------------------- fit

    def fit(self, datamodules: Sequence) -> Dict[str, Any]:
        cfg = self.config
        s = self._n_seeds
        assert len(datamodules) == s, "need one datamodule per seed"
        for dm in datamodules:
            dm.prepare_data()
            dm.setup("fit")
        samples = [next(iter(dm.train_batches(0))) for dm in datamodules]
        sample_stacked = self._put_batch(samples)

        total_steps = 0
        if cfg.scheduler == "cosine" and hasattr(datamodules[0],
                                                 "split_size"):
            bs = samples[0]["image"].shape[0]
            total_steps = (-(-datamodules[0].split_size("train") // bs)
                           * cfg.max_epochs)
        if self.states is None:
            self._init_states(sample_stacked, total_steps)

        drop_rngs = jnp.stack([jax.random.PRNGKey(s_ + 1)
                               for s_ in self.seeds])
        if self._state_sh is not None:
            drop_rngs = jax.device_put(drop_rngs, self._state_sh)

        # deep copy: _train_step donates its input states, so aliasing the
        # initial params here would leave best pointing at deleted buffers
        best = jax.tree_util.tree_map(
            jnp.copy, {"params": self.states.params,
                       "batch_stats": self.states.batch_stats})
        best_acc = jnp.full((s,), -1.0)
        best_epoch = jnp.full((s,), -1, jnp.int32)

        # host-side per-seed early-stopping counters (epoch granularity)
        best_val_loss = np.full((s,), np.inf)
        patience_left = np.full((s,), cfg.patience, np.int64)
        halted = np.zeros((s,), bool)
        history: List[Dict[str, Any]] = []

        for epoch in range(cfg.max_epochs):
            frozen = bool(cfg.freeze_nfp and epoch < cfg.unfreeze_epoch)
            t0 = time.perf_counter()
            active = jnp.asarray(~halted)
            loss_sum = jnp.zeros((s,))
            cm = jnp.zeros((s,) + init_confusion(self.num_classes).shape,
                           jnp.float32)
            nb = 0
            for row in self._zip_streams(
                    [dm.train_batches(epoch) for dm in datamodules]):
                self.states, loss, cm_up = self._train_step(
                    self.states, self._put_batch(row), drop_rngs, active,
                    frozen=frozen)
                loss_sum = loss_sum + jnp.where(active, loss, 0.0)
                cm = cm + jnp.where(active.reshape(-1, 1, 1), cm_up, 0.0)
                nb += 1

            val = self._evaluate(datamodules, "val")
            train_losses = jax.device_get(loss_sum) / max(nb, 1)
            val_acc = jnp.asarray([m["accuracy"] for m in val])
            best, best_acc, best_epoch = self._update_best(
                best, best_acc, best_epoch, self.states, val_acc,
                jnp.asarray(epoch, jnp.int32), jnp.asarray(~halted))

            rec_seeds = []
            for i, seed in enumerate(self.seeds):
                if halted[i]:
                    continue
                rec_seeds.append({
                    "seed": seed, "train_loss": float(train_losses[i]),
                    "val": {k: v for k, v in val[i].items()
                            if k != "confusion"}})
                # EarlyStopping(val_loss, patience, min_delta) per seed
                if val[i]["loss"] < best_val_loss[i] - cfg.min_delta:
                    best_val_loss[i] = val[i]["loss"]
                    patience_left[i] = cfg.patience
                else:
                    patience_left[i] -= 1
                    if patience_left[i] <= 0:
                        halted[i] = True
            record = {"epoch": epoch, "frozen": frozen, "seeds": rec_seeds,
                      "time_s": time.perf_counter() - t0}
            history.append(record)
            self._log(record)
            print(f"epoch {epoch:3d} | "
                  + " ".join(f"s{r['seed']}: vl {r['val']['loss']:.4f} "
                             f"va {r['val']['accuracy']:.4f}"
                             for r in rec_seeds)
                  + f" | {record['time_s']:.1f}s", flush=True)
            if halted.all():
                print(f"all seeds early-stopped by epoch {epoch}")
                break

        self.best = {"tree": best,
                     "val_acc": jax.device_get(best_acc),
                     "epoch": jax.device_get(best_epoch)}
        self._save_best_checkpoints()
        return {"history": history, "best": self.best}

    # ---------------------------------------------------------------- eval

    def _evaluate(self, datamodules, split: str,
                  states=None) -> List[Dict[str, float]]:
        states = states if states is not None else self.states
        s = self._n_seeds
        loss_sum = jnp.zeros((s,))
        w_sum = jnp.zeros((s,))
        cm = jnp.zeros((s,) + init_confusion(self.num_classes).shape,
                       jnp.float32)
        streams = [dm.val_batches() if split == "val" else dm.test_batches()
                   for dm in datamodules]
        for row in self._zip_streams(streams):
            loss_sum, w_sum, cm = self._eval_accum(
                states, self._put_batch(row), loss_sum, w_sum, cm)
        return self._per_seed_metrics(loss_sum, w_sum, cm)

    def test(self, datamodules) -> List[Dict[str, float]]:
        """Per-seed test metrics with each seed's BEST (val_acc) params —
        the reference's reload-best-then-test (``demo.py:417-428``)."""
        assert self.best is not None, "fit() first"
        for dm in datamodules:
            dm.setup("test")
        test_states = self.states.replace(
            params=self.best["tree"]["params"],
            batch_stats=self.best["tree"]["batch_stats"])
        metrics = self._evaluate(datamodules, "test", states=test_states)
        for seed, m in zip(self.seeds, metrics):
            self._log({"seed": seed,
                       "test": {k: v for k, v in m.items()
                                if k != "confusion"}})
        return metrics

    # ------------------------------------------------------------- persist

    def _save_best_checkpoints(self) -> None:
        if not self._io_leader or self.best is None:
            return
        from ..train.checkpoint import save_checkpoint

        host_best = jax.device_get(self.best["tree"])
        host_states = jax.device_get(
            {"step": self.states.step, "opt_state": self.states.opt_state})
        for i, seed in enumerate(self.seeds):
            per_seed = self.states.replace(
                step=host_states["step"][i],
                params=jax.tree_util.tree_map(
                    lambda a: a[i], host_best["params"]),
                batch_stats=jax.tree_util.tree_map(
                    lambda a: a[i], host_best["batch_stats"]),
                opt_state=jax.tree_util.tree_map(
                    lambda a: a[i], host_states["opt_state"]))
            save_checkpoint(
                os.path.join(self.config.ckpt_dir, f"seed{seed}", "best"),
                per_seed,
                {"epoch": int(self.best["epoch"][i]),
                 "accuracy": float(self.best["val_acc"][i]), "seed": seed})
