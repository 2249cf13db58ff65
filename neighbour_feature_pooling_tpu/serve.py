"""Serving: a compiled batched predictor + AOT export.

The reference stops at ``trainer.test`` (``/root/reference/demo.py:427``);
production use of a texture classifier needs a stable inference surface.
``Predictor`` wraps a trained ``TextureModel``: one jit-compiled function at
a fixed batch size (requests are padded, so there is exactly one compilation
per predictor), host-side preprocessing through the same eval transform as
training (native C++ augment kernel when available), softmax probabilities
and argmax labels out.

``export_predictor``/``load_exported`` freeze the forward into a
``jax.export`` StableHLO artifact plus a weights file: the serving side
deserializes and runs it WITHOUT this package's model-building code (or
flax) — the TPU-native analog of TorchScript/SavedModel deployment.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data.transforms import TransformConfig, eval_transform
from .models import get_model
from .train.checkpoint import restore_for_inference

__all__ = ["Predictor", "export_predictor", "load_exported",
           "ExportedPredictor"]


@dataclasses.dataclass
class Predictor:
    """Compiled inference endpoint for a texture-pooling classifier."""

    model_type: str
    model_variant: str
    num_classes: int
    checkpoint: Optional[str] = None      # path prefix from save_checkpoint
    import_ckpt: Optional[str] = None     # OR: a trained PyTorch reference
    #                                       checkpoint (Lightning .ckpt /
    #                                       state_dict), converted via
    #                                       models.import_torch
    batch_size: int = 32
    input_size: int = 224
    resize_size: int = 256
    num_input_channels: int = 3
    transform: Optional[TransformConfig] = None
    model_kwargs: Optional[Dict] = None
    quantize: Optional[str] = None        # None (fp32) | "int8"
    fold_bn: bool = True                  # int8 only: fold inference BNs
    #                                       into the conv dequant epilogue
    quantize_spatial: bool = True         # int8 only: False = mixed tier
    #                                       (dense/1×1 int8, spatial convs
    #                                       stay in the model dtype —
    #                                       pair with dtype=bf16)
    data_parallel: bool = False           # shard batches over all local
    #                                       devices (params replicated)

    def __post_init__(self):
        self.model = get_model(self.model_type, self.model_variant,
                               self.num_classes,
                               num_input_channels=self.num_input_channels,
                               **(self.model_kwargs or {}))
        self.transform = self.transform or TransformConfig(
            resize_size=self.resize_size, input_size=self.input_size)
        if self.checkpoint and self.import_ckpt:
            raise ValueError("pass either checkpoint or import_ckpt, "
                             "not both")
        if self.checkpoint:
            # structure-free restore: works for checkpoints trained under
            # any optimizer/scheduler configuration
            params, batch_stats = restore_for_inference(self.checkpoint)
        elif self.import_ckpt:
            # serve a reference-trained model directly (migration path):
            # torch .ckpt/.pt -> flax variables, no retraining. Validated
            # (and pruned of forward-unused backbone tensors, e.g. MNv3
            # conv_head) against this model's own init tree
            from .models.import_torch import import_reference_checkpoint

            dummy = jnp.zeros((1, self.input_size, self.input_size,
                               self.num_input_channels), jnp.float32)
            init = self.model.init({"params": jax.random.PRNGKey(0)},
                                   dummy, train=False)
            variables, _ = import_reference_checkpoint(
                self.import_ckpt, self.model_type, self.model_variant,
                in_chans=self.num_input_channels, validate_against=init)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
        else:
            dummy = jnp.zeros((1, self.input_size, self.input_size,
                               self.num_input_channels), jnp.float32)
            variables = self.model.init({"params": jax.random.PRNGKey(0)},
                                        dummy, train=False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
        self._variables = {"params": params, "batch_stats": batch_stats}

        if self.quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {self.quantize!r}; "
                             "expected None or 'int8'")
        if self.quantize == "int8":
            # weight pre-quantization: bake the per-channel s8 weights +
            # scales once at build (one jitted sweep); serving calls
            # skip the per-batch weight sweep (read + amax + round of
            # every kernel). Same values as in-line quantization up to
            # 1-ulp scale reassociation (quant.py).
            from .quant import QuantConfig, prequantize_weights

            self._variables["int8w"] = prequantize_weights(
                self._variables,
                QuantConfig(quantize_spatial=self.quantize_spatial))
        self._act_scales = None
        self._int8_chains = None
        self._build_forward()

    def _build_forward(self):
        if self.quantize == "int8":
            # every eligible Conv/Dense runs s8×s8→s32 on the MXU; the
            # interception happens at trace time, so the jitted function
            # below is permanently the quantized program (see quant.py)
            from .quant import (QuantConfig, build_bn_folding,
                                make_int8_interceptor)

            import flax.linen as nn

            folding = None
            if self.fold_bn:
                dummy = jnp.zeros(
                    (self.batch_size, self.input_size, self.input_size,
                     self.num_input_channels), jnp.float32)
                folding = build_bn_folding(self.model, self._variables,
                                           dummy)
            self._quant_config = QuantConfig(
                act_scales=self._act_scales, bn_folding=folding,
                int8_chains=self._int8_chains,
                quantize_spatial=self.quantize_spatial)
            interceptor = make_int8_interceptor(self._quant_config)

            @jax.jit
            def _forward(variables, images):
                with nn.intercept_methods(interceptor):
                    logits = self.model.apply(variables, images,
                                              train=False)
                return jax.nn.softmax(logits, axis=-1)

            # serve with the fp32 kernels of prequantized layers dropped
            # (dead jit inputs otherwise — see quant.strip_prequantized):
            # a shape-only probe trace records which layers the program
            # actually quantizes
            from .quant import strip_prequantized

            replaced = []
            probe = make_int8_interceptor(self._quant_config,
                                          replaced=replaced)
            probe_x = jnp.zeros((1, self.input_size, self.input_size,
                                 self.num_input_channels), jnp.float32)

            def _probe(variables, images):
                with nn.intercept_methods(probe):
                    return self.model.apply(variables, images, train=False)

            jax.eval_shape(_probe, self._variables, probe_x)
            self._serve_variables = strip_prequantized(self._variables,
                                                       replaced)
        else:
            @jax.jit
            def _forward(variables, images):
                logits = self.model.apply(variables, images, train=False)
                return jax.nn.softmax(logits, axis=-1)

            self._serve_variables = self._variables

        if self.data_parallel and jax.local_device_count() > 1:
            # data-parallel serving: params replicated once, every
            # request batch split over the device mesh. shard_map (not
            # bare jit-with-shardings) so each shard runs the literal
            # single-chip program — GSPMD never has to reason about the
            # opaque Pallas int8 kernels, and no collectives appear
            # (the forward is batch-pointwise). With dynamic int8
            # quantization the activation amax becomes per-shard, which
            # is a per-request-chunk dynamic scale — same accuracy
            # story; calibrated scales are identical either way.
            from jax.sharding import PartitionSpec as P

            from .parallel.mesh import (create_mesh,
                                        replicated_sharding)

            mesh = create_mesh(jax.local_devices())  # host-local serving
            if self.batch_size % mesh.devices.size:
                raise ValueError(
                    f"data_parallel serving needs batch_size "
                    f"({self.batch_size}) divisible by the device count "
                    f"({mesh.devices.size})")
            self._mesh = mesh
            # replicate only the serving tree (stripped of dead fp32
            # kernels under int8); the full tree stays host-side for
            # calibrate()'s float observe pass
            self._serve_variables = jax.device_put(
                self._serve_variables, replicated_sharding(mesh))
            base = _forward
            _forward = jax.jit(jax.shard_map(
                lambda v, x: base(v, x), mesh=mesh,
                in_specs=(P(), P("data")), out_specs=P("data"),
                check_vma=False))

        self._forward = _forward

    def calibrate(self, images: Sequence[np.ndarray],
                  preprocessed: bool = False) -> int:
        """Static activation calibration for the int8 tier.

        Observes ``max|x|`` per quantized layer over the sample images
        (any count; batched at the compiled batch size) and rebuilds the
        forward so every layer uses its fixed calibrated scale — removing
        the dynamic per-batch amax pass (an extra full HBM read of every
        activation tensor). With the scales known, conv→conv chains
        (``build_int8_chains``) also activate: chained producers emit
        requantized s8 directly, ReLU fused, verified end-to-end against
        the unchained program before use. Returns the number of
        calibrated layers.
        """
        if self.quantize != "int8":
            raise ValueError("calibrate() requires quantize='int8'")
        from .quant import build_int8_chains, calibrate_act_scales

        x = (np.asarray(images, np.float32) if preprocessed
             else self.preprocess(images))
        pad = (-x.shape[0]) % self.batch_size
        if pad:
            # zero rows never raise a max|x| — pad to the compiled batch
            # size so calibration costs exactly one trace/compile
            x = np.concatenate(
                [x, np.zeros((pad,) + x.shape[1:], np.float32)])
        batches = [jnp.asarray(x[i: i + self.batch_size])
                   for i in range(0, x.shape[0], self.batch_size)]
        self._act_scales = calibrate_act_scales(
            self.model, self._variables, batches,
            config=self._quant_config)
        self._int8_chains = build_int8_chains(
            self.model, self._variables, batches[0], self._act_scales,
            config=self._quant_config) or None
        self._build_forward()
        return len(self._act_scales)

    def reload(self, checkpoint: Optional[str] = None) -> str:
        """Hot-swap weights from ``checkpoint`` (default: the build-time
        path) — the online-serving weight-update path (a freshly trained
        ``best`` lands on disk; the endpoint picks it up without a
        restart).

        The fp32/bf16 tier swaps the variables the already-compiled
        forward is called with — NO retrace/recompile. The int8 tier must
        rebuild (weight prequantization and BN folding are baked against
        the old weights), and any calibrated activation scales / verified
        chains are dropped (they were measured against the old weights —
        call :meth:`calibrate` again). Returns the checkpoint path used.
        """
        path = checkpoint or self.checkpoint
        if not path:
            raise ValueError("no checkpoint to reload: the predictor was "
                             "built without one and none was given")
        params, batch_stats = restore_for_inference(path)
        new_vars = {"params": params, "batch_stats": batch_stats}
        # validate BEFORE touching any state: restore_for_inference is
        # structure-free, so a checkpoint from a different model/classes
        # would otherwise 'succeed' here and poison every later predict
        self._check_compatible(new_vars, path)
        if self.quantize == "int8":
            from .quant import QuantConfig, prequantize_weights

            new_vars["int8w"] = prequantize_weights(
                new_vars,
                QuantConfig(quantize_spatial=self.quantize_spatial))
            # commit + rebuild; roll back wholesale if the BN-folding
            # trace / probe fails so the endpoint keeps serving the old
            # weights instead of a mixed state
            saved = (self.checkpoint, self._variables, self._act_scales,
                     self._int8_chains, self._forward,
                     self._serve_variables,
                     getattr(self, "_quant_config", None))
            self.checkpoint, self._variables = path, new_vars
            self._act_scales = None   # calibrated against the old weights
            self._int8_chains = None
            try:
                self._build_forward()
            except Exception:
                (self.checkpoint, self._variables, self._act_scales,
                 self._int8_chains, self._forward, self._serve_variables,
                 self._quant_config) = saved
                raise
        elif getattr(self, "_mesh", None) is not None:
            from .parallel.mesh import replicated_sharding

            sv = jax.device_put(new_vars, replicated_sharding(self._mesh))
            self.checkpoint, self._variables = path, new_vars
            self._serve_variables = sv
        else:
            self.checkpoint, self._variables = path, new_vars
            self._serve_variables = new_vars
        return path

    def _check_compatible(self, new_vars: Dict, path: str) -> None:
        """Reject a checkpoint whose (params, batch_stats) tree or leaf
        shapes/dtypes differ from the serving model's."""
        def spec(tree):
            # (shape, dtype-name) per leaf; dict equality then covers both
            # tree structure and leaf specs in one comparison
            return jax.tree_util.tree_map(
                lambda a: (tuple(np.shape(a)),
                           str(getattr(a, "dtype", None)
                               or np.asarray(a).dtype)), tree)

        want = {k: self._variables[k] for k in ("params", "batch_stats")}
        got = {k: new_vars[k] for k in ("params", "batch_stats")}
        if spec(want) != spec(got):
            raise ValueError(
                f"checkpoint {path!r} is incompatible with this predictor "
                f"({self.model_type}/{self.model_variant}/"
                f"{self.num_classes} classes): parameter tree or leaf "
                "shapes differ")

    def preprocess(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """HWC float arrays in [0,1] (any sizes) → normalized model input."""
        return np.stack([eval_transform(np.asarray(im, np.float32),
                                        self.transform) for im in images])

    def predict(self, images: Sequence[np.ndarray],
                preprocessed: bool = False) -> Dict[str, np.ndarray]:
        """Classify a list of images of any length.

        Returns ``{"probabilities": (N, K), "label": (N,)}``. Requests are
        chunked/padded to the compiled batch size.
        """
        if len(images) == 0:
            return {"probabilities": np.zeros((0, self.num_classes),
                                              np.float32),
                    "label": np.zeros((0,), np.int64)}
        x = (np.asarray(images, np.float32) if preprocessed
             else self.preprocess(images))
        n = x.shape[0]
        probs_out = []
        for start in range(0, n, self.batch_size):
            chunk = x[start: start + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            probs = np.asarray(self._forward(self._serve_variables,
                                             jnp.asarray(chunk)))
            probs_out.append(probs[: self.batch_size - pad])
        probs = np.concatenate(probs_out)
        return {"probabilities": probs, "label": probs.argmax(-1)}


# ---------------------------------------------------------------------------
# AOT export (jax.export / StableHLO)
# ---------------------------------------------------------------------------


def export_predictor(predictor: Predictor, path: str,
                     platforms: Optional[Sequence[str]] = None) -> None:
    """Freeze a predictor into a self-contained serving artifact.

    Writes ``forward.jaxexport`` (the jitted softmax-forward lowered to
    StableHLO for the given platforms via ``jax.export``), ``variables.npz``
    (flattened weights) and ``meta.json`` (shapes + transform config). The
    artifact reloads with ``load_exported`` — no model code, no flax.

    ``platforms`` defaults to the CURRENT backend only: the NFP op picks
    its Pallas-vs-interpret lowering from the backend at trace time, so
    export on the platform you will serve on (export on TPU → Mosaic
    kernel baked in; a CPU-exported artifact would carry the interpreter).
    """
    from jax import export as jexport

    if getattr(predictor, "_mesh", None) is not None:
        raise ValueError(
            "export_predictor does not support data_parallel predictors "
            "(the artifact would be pinned to this mesh); export a "
            "Predictor(data_parallel=False) twin and shard at load time")
    if platforms is None:
        platforms = [jax.default_backend()]

    # the serving tree: under int8 this omits the dead fp32 kernels of
    # prequantized layers, so the artifact carries s8 weights (+ scales)
    # instead of fp32+s8 for those layers
    flat, treedef = jax.tree_util.tree_flatten(predictor._serve_variables)

    def forward_flat(leaves, images):
        variables = jax.tree_util.tree_unflatten(treedef, leaves)
        return predictor._forward(variables, images)

    x_spec = jax.ShapeDtypeStruct(
        (predictor.batch_size, predictor.input_size, predictor.input_size,
         predictor.num_input_channels), jnp.float32)
    leaf_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat]
    exp = jexport.export(jax.jit(forward_flat),
                         platforms=list(platforms))(leaf_specs, x_spec)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "forward.jaxexport"), "wb") as f:
        f.write(exp.serialize())
    np.savez(os.path.join(path, "variables.npz"),
             **{str(i): np.asarray(a) for i, a in enumerate(flat)})
    cfg = predictor.transform
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({
            "batch_size": predictor.batch_size,
            "input_size": predictor.input_size,
            "num_classes": predictor.num_classes,
            "num_input_channels": predictor.num_input_channels,
            "platforms": list(platforms),
            "transform": {"resize_size": cfg.resize_size,
                          "input_size": cfg.input_size,
                          "mean": list(cfg.mean), "std": list(cfg.std)},
        }, f, indent=1)


@dataclasses.dataclass
class ExportedPredictor:
    """A deserialized serving artifact: same ``predict`` contract as
    ``Predictor`` but backed by the frozen StableHLO function."""

    forward: object          # jitted exported.call
    leaves: List[np.ndarray]
    meta: Dict

    @property
    def batch_size(self) -> int:
        return int(self.meta["batch_size"])

    @property
    def num_classes(self) -> int:
        return int(self.meta["num_classes"])

    def preprocess(self, images: Sequence[np.ndarray]) -> np.ndarray:
        t = self.meta["transform"]
        cfg = TransformConfig(resize_size=t["resize_size"],
                              input_size=t["input_size"],
                              mean=tuple(t["mean"]), std=tuple(t["std"]))
        return np.stack([eval_transform(np.asarray(im, np.float32), cfg)
                         for im in images])

    def predict(self, images: Sequence[np.ndarray],
                preprocessed: bool = False) -> Dict[str, np.ndarray]:
        if len(images) == 0:
            return {"probabilities": np.zeros((0, self.num_classes),
                                              np.float32),
                    "label": np.zeros((0,), np.int64)}
        x = (np.asarray(images, np.float32) if preprocessed
             else self.preprocess(images))
        bs = self.batch_size
        probs_out = []
        for start in range(0, x.shape[0], bs):
            chunk = x[start: start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            probs = np.asarray(self.forward(self.leaves,
                                            jnp.asarray(chunk)))
            probs_out.append(probs[: bs - pad])
        probs = np.concatenate(probs_out)
        return {"probabilities": probs, "label": probs.argmax(-1)}


def load_exported(path: str) -> ExportedPredictor:
    """Reload an ``export_predictor`` artifact. Needs only jax + numpy —
    the model-building code (flax modules, registries) is not imported."""
    from jax import export as jexport

    with open(os.path.join(path, "forward.jaxexport"), "rb") as f:
        exp = jexport.deserialize(f.read())
    npz = np.load(os.path.join(path, "variables.npz"))
    leaves = [npz[str(i)] for i in range(len(npz.files))]
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return ExportedPredictor(forward=jax.jit(exp.call), leaves=leaves,
                             meta=meta)
