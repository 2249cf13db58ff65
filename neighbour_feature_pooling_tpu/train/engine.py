"""Jit-compiled train/eval steps.

The TPU-native replacement for the reference's ``Lightning_Wrapper``
(``/root/reference/lightning_wrappers/Lightning_Wrapper.py``):

* loss: cross-entropy with label smoothing 0.05 (``Lightning_Wrapper.py:35``);
* optimizer: Adam (torch defaults: b1=0.9, b2=0.999, eps=1e-8,
  ``Lightning_Wrapper.py:69-70``);
* metrics: accuracy + macro F1/precision/recall accumulated as one confusion
  matrix inside the jitted step (``metrics.py``);
* freeze schedule: gradients of parameters whose path contains ``nfp_head``
  or ``se_gate`` are zeroed until ``unfreeze_epoch``
  (``Lightning_Wrapper.py:193-203`` — keyed the same way, so it is active for
  the legacy se_gate/NFPHead variants and a no-op for the ``pool.*`` texture
  heads, exactly as in the reference).

Both steps are pure functions of a ``TrainState`` pytree, jitted once with
donated state and shardings supplied by the caller (``parallel/mesh.py``).
Batches are dicts ``{"image": NHWC, "label": (B,), "weight": (B,)}``; the
weight channel masks padding examples so epoch metrics are exact without
dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .metrics import confusion_matrix_update, init_confusion

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_multi_train_step", "make_eval_step", "cross_entropy_loss",
           "freeze_mask", "train_step_body", "eval_step_body",
           "optimizer_hyperparams"]


def optimizer_hyperparams(opt_state):
    """The ``inject_hyperparams`` dict (plateau scheduler), whether or not
    the optimizer is wrapped in :class:`optax.MultiSteps` (grad_accum)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    inner = getattr(opt_state, "inner_opt_state", None)
    if inner is not None and hasattr(inner, "hyperparams"):
        return inner.hyperparams
    raise AttributeError("optimizer state carries no hyperparams "
                         "(scheduler != 'plateau'?)")


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    #: optional ``state -> state`` sharding pin applied after each update
    #: (set by ``parallel.zero.shard_state_zero``): keeps ZeRO/FSDP layouts
    #: stable across donated-buffer steps. ``None`` = no-op.
    constrain: Optional[Callable] = flax.struct.field(pytree_node=False,
                                                      default=None)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        new = self.replace(step=self.step + 1, params=new_params,
                           opt_state=new_opt_state)
        if self.constrain is not None:
            new = self.constrain(new)
        return new


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       weights: jax.Array,
                       label_smoothing: float = 0.05) -> jax.Array:
    """Label-smoothed CE matching ``nn.CrossEntropyLoss(label_smoothing=0.05)``
    (mean over non-padded examples)."""
    k = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, k)
    smoothed = onehot * (1.0 - label_smoothing) + label_smoothing / k
    per_ex = -jnp.sum(smoothed * jax.nn.log_softmax(logits), axis=-1)
    w = weights.astype(per_ex.dtype)
    return jnp.sum(per_ex * w) / jnp.maximum(jnp.sum(w), 1.0)


def freeze_mask(params, substrings: Tuple[str, ...] = ("nfp_head", "se_gate")):
    """0/1 pytree: 0 where any path component contains a freeze key."""
    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: 0.0 if any(s in part for part in k for s in substrings) else 1.0
        for k in flat
    }
    return flax.traverse_util.unflatten_dict(mask)


def _replace_variables(variables: Dict[str, Any],
                       loaded: Dict[str, Any]) -> Dict[str, Any]:
    """Replace the WHOLE params/batch_stats trees with loaded ones (a full
    imported reference checkpoint, ``models/import_torch.py``), validating
    structure + shapes against the init tree and casting each leaf to the
    init leaf's dtype (so a bf16-configured model keeps its param dtypes)."""
    from ..models.import_torch import prune_unused_backbone

    loaded, _ = prune_unused_backbone(loaded, variables)
    out = dict(variables)
    for col in ("params", "batch_stats"):
        sub = loaded.get(col)
        if sub is None:
            if flax.traverse_util.flatten_dict(variables.get(col, {})):
                raise ValueError(f"imported checkpoint has no {col} "
                                 f"collection but the model needs one")
            continue
        want = flax.traverse_util.flatten_dict(variables.get(col, {}))
        got = flax.traverse_util.flatten_dict(sub)
        if set(want) != set(got):
            missing = sorted(set(want) - set(got))[:5]
            extra = sorted(set(got) - set(want))[:5]
            raise ValueError(
                f"imported {col} tree mismatch: missing={missing} "
                f"extra={extra}")
        for k in want:
            if tuple(want[k].shape) != tuple(got[k].shape):
                raise ValueError(
                    f"imported {col} shape mismatch at {'/'.join(k)}: "
                    f"init {want[k].shape} vs loaded {got[k].shape}")
        out[col] = jax.tree_util.tree_map(
            lambda w, g: jnp.asarray(g, dtype=w.dtype),
            variables.get(col, {}),
            flax.traverse_util.unflatten_dict(got))
    return out


def _merge_backbone(variables: Dict[str, Any],
                    pretrained: Dict[str, Any]) -> Dict[str, Any]:
    """Replace the ``backbone`` subtree of freshly-initialized variables with
    a ported pretrained tree (``models/backbones/timm_port.py``), validating
    leaf names and shapes against the init tree."""
    out = dict(variables)
    for col in ("params", "batch_stats"):
        sub = pretrained.get(col)
        if not sub:
            continue
        init_bb = variables.get(col, {}).get("backbone")
        if init_bb is None:
            raise ValueError(f"model has no backbone {col} to load into")
        want = flax.traverse_util.flatten_dict(init_bb)
        got = flax.traverse_util.flatten_dict(sub)
        if set(want) != set(got):
            missing = sorted(set(want) - set(got))[:5]
            extra = sorted(set(got) - set(want))[:5]
            raise ValueError(
                f"pretrained {col} tree mismatch: missing={missing} "
                f"extra={extra}")
        for k in want:
            if tuple(want[k].shape) != tuple(got[k].shape):
                raise ValueError(
                    f"pretrained {col} shape mismatch at {'/'.join(k)}: "
                    f"init {want[k].shape} vs ported {got[k].shape}")
        col_tree = dict(out[col])
        col_tree["backbone"] = jax.tree_util.tree_map(jnp.asarray, sub)
        out[col] = col_tree
    return out


def create_train_state(model, rng: jax.Array, sample_batch: Dict[str, jax.Array],
                       learning_rate: float, scheduler: str = "none",
                       total_steps: int = 0,
                       pretrained_backbone: Optional[Dict[str, Any]] = None,
                       grad_accum: int = 1,
                       init_variables: Optional[Dict[str, Any]] = None
                       ) -> TrainState:
    """Initialize params/batch_stats and an Adam optimizer.

    ``scheduler``: ``none`` (reference default, Lightning_Wrapper.py:69-79),
    ``cosine`` (decay over ``total_steps``), or ``plateau`` (the optimizer's
    learning rate is exposed via ``inject_hyperparams`` so the trainer can
    reduce it when ``val_loss`` plateaus, torch ReduceLROnPlateau-style).

    ``grad_accum > 1`` wraps the optimizer in :class:`optax.MultiSteps`:
    every train step accumulates the micro-batch gradient and parameters
    update once per ``grad_accum`` steps with the mean — an effective
    batch ``grad_accum×`` larger in the same per-step HBM (the TPU answer
    to growing the reference's fixed batch past device memory). For
    ``cosine``, ``total_steps`` counts optimizer *updates* (the trainer
    divides its micro-step count down).

    ``pretrained_backbone``: optional ported timm variables
    (``{"params": ..., "batch_stats": ...}`` backbone subtree) replacing the
    random backbone init — the reference's ``pretrained=True``
    (``/root/reference/models/texture_pooling.py:19``).

    ``init_variables``: optional FULL variable tree (backbone + head +
    classifier) replacing the random init wholesale — the warm-start path
    for imported reference checkpoints (``models/import_torch.py``); the
    optimizer still starts fresh. Mutually exclusive with
    ``pretrained_backbone``.
    """
    variables = model.init({"params": rng}, sample_batch["image"][:1],
                           train=False)
    if init_variables is not None:
        if pretrained_backbone is not None:
            raise ValueError("pass either pretrained_backbone or "
                             "init_variables, not both")
        variables = _replace_variables(variables, init_variables)
    if pretrained_backbone is not None:
        variables = _merge_backbone(variables, pretrained_backbone)
    if scheduler == "cosine":
        if total_steps <= 0:
            raise ValueError("cosine scheduler needs total_steps > 0")
        sched = optax.cosine_decay_schedule(learning_rate, total_steps)
        tx = optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)
    elif scheduler == "plateau":
        tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    elif scheduler == "none":
        tx = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(grad_accum))
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def train_step_body(state: TrainState, batch, dropout_rng, frozen: bool,
                    num_classes: int, label_smoothing: float = 0.05,
                    freeze_substrings: Tuple[str, ...] = ("nfp_head",
                                                          "se_gate")):
    """One optimizer step as a pure traceable function — the unit that
    ``make_train_step`` jits and that multi-step callers ``lax.scan`` over
    (each scan iteration gets a distinct dropout rng via ``state.step``)."""
    step_rng = jax.random.fold_in(dropout_rng, state.step)

    def loss_fn(params):
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], train=True,
            rngs={"dropout": step_rng},
            mutable=["batch_stats"])
        loss = cross_entropy_loss(logits, batch["label"], batch["weight"],
                                  label_smoothing)
        return loss, (logits, mutated.get("batch_stats", {}))

    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    if frozen:
        mask = freeze_mask(state.params, freeze_substrings)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
    state = state.apply_gradients(grads).replace(batch_stats=new_stats)
    cm = confusion_matrix_update(init_confusion(num_classes), logits,
                                 batch["label"], batch["weight"])
    return state, loss, cm


def make_train_step(num_classes: int, label_smoothing: float = 0.05,
                    freeze_substrings: Tuple[str, ...] = ("nfp_head",
                                                          "se_gate")):
    """Build the jitted train step.

    Signature: ``(state, batch, dropout_rng, frozen: bool static) ->
    (state, loss, confusion_update)``.
    """

    @functools.partial(jax.jit, static_argnames=("frozen",),
                       donate_argnames=("state",))
    def train_step(state: TrainState, batch, dropout_rng, frozen: bool = False):
        return train_step_body(state, batch, dropout_rng, frozen,
                               num_classes, label_smoothing,
                               freeze_substrings)

    return train_step


def make_multi_train_step(num_classes: int, k: int,
                          label_smoothing: float = 0.05,
                          freeze_substrings: Tuple[str, ...] = ("nfp_head",
                                                                "se_gate")):
    """Build a K-optimizer-steps-per-dispatch train step.

    ``lax.scan`` over ``train_step_body`` with batches stacked on a leading
    (K, ...) axis: one host dispatch drives K device steps, amortizing the
    per-dispatch overhead (through the TPU relay the single-step loop loses
    ~10% to dispatch; see PARITY.md training table). Per-step dropout rngs
    stay distinct (``train_step_body`` folds ``state.step`` in) and metrics
    stay exact: returns per-step losses ``(K,)`` and confusion updates
    ``(K, C, C)``.

    Signature: ``(state, stacked_batch, dropout_rng, frozen: bool static)
    -> (state, losses, confusions)``.
    """

    @functools.partial(jax.jit, static_argnames=("frozen",),
                       donate_argnames=("state",))
    def multi_step(state: TrainState, stacked_batch, dropout_rng,
                   frozen: bool = False):
        def f(s, batch):
            s2, loss, cm = train_step_body(s, batch, dropout_rng, frozen,
                                           num_classes, label_smoothing,
                                           freeze_substrings)
            return s2, (loss, cm)

        state, (losses, cms) = jax.lax.scan(f, state, stacked_batch,
                                            length=k)
        return state, losses, cms

    return multi_step


def eval_step_body(state: TrainState, batch, num_classes: int,
                   label_smoothing: float = 0.05):
    """One eval pass as a pure traceable function — jitted directly by
    ``make_eval_step`` and ``vmap``-ped over the seed axis by
    ``parallel/seed_parallel.py``."""
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=False)
    w = batch["weight"].astype(jnp.float32)
    k = logits.shape[-1]
    onehot = jax.nn.one_hot(batch["label"], k)
    smoothed = onehot * (1.0 - label_smoothing) + label_smoothing / k
    per_ex = -jnp.sum(smoothed * jax.nn.log_softmax(logits), axis=-1)
    cm = confusion_matrix_update(init_confusion(num_classes), logits,
                                 batch["label"], batch["weight"])
    return jnp.sum(per_ex * w), jnp.sum(w), cm, logits


def make_eval_step(num_classes: int, label_smoothing: float = 0.05):
    """Build the jitted eval step: ``(state, batch) -> (loss_sum, weight_sum,
    confusion_update, logits)``."""

    @jax.jit
    def eval_step(state: TrainState, batch):
        return eval_step_body(state, batch, num_classes, label_smoothing)

    return eval_step
