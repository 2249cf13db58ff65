"""Serving: a compiled batched predictor.

The reference stops at ``trainer.test`` (``/root/reference/demo.py:427``);
production use of a texture classifier needs a stable inference surface.
``Predictor`` wraps a trained ``TextureModel``: one jit-compiled function at
a fixed batch size (requests are padded, so there is exactly one compilation
per predictor), host-side preprocessing through the same eval transform as
training (native C++ augment kernel when available), softmax probabilities
and argmax labels out.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data.transforms import TransformConfig, eval_transform
from .models import get_model
from .train.checkpoint import restore_for_inference

__all__ = ["Predictor"]


@dataclasses.dataclass
class Predictor:
    """Compiled inference endpoint for a texture-pooling classifier."""

    model_type: str
    model_variant: str
    num_classes: int
    checkpoint: Optional[str] = None      # path prefix from save_checkpoint
    batch_size: int = 32
    input_size: int = 224
    resize_size: int = 256
    num_input_channels: int = 3
    transform: Optional[TransformConfig] = None
    model_kwargs: Optional[Dict] = None

    def __post_init__(self):
        self.model = get_model(self.model_type, self.model_variant,
                               self.num_classes,
                               num_input_channels=self.num_input_channels,
                               **(self.model_kwargs or {}))
        self.transform = self.transform or TransformConfig(
            resize_size=self.resize_size, input_size=self.input_size)
        if self.checkpoint:
            # structure-free restore: works for checkpoints trained under
            # any optimizer/scheduler configuration
            params, batch_stats = restore_for_inference(self.checkpoint)
        else:
            dummy = jnp.zeros((1, self.input_size, self.input_size,
                               self.num_input_channels), jnp.float32)
            variables = self.model.init({"params": jax.random.PRNGKey(0)},
                                        dummy, train=False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
        self._variables = {"params": params, "batch_stats": batch_stats}

        @jax.jit
        def _forward(variables, images):
            logits = self.model.apply(variables, images, train=False)
            return jax.nn.softmax(logits, axis=-1)

        self._forward = _forward

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
            probs = np.asarray(self._forward(self._variables,
                                             jnp.asarray(chunk)))
            probs_out.append(probs[: self.batch_size - pad])
        probs = np.concatenate(probs_out)
        return {"probabilities": probs, "label": probs.argmax(-1)}
