"""Torch-default parameter re-initialization for flax variable trees.

PyTorch's ``nn.Conv2d`` / ``nn.Linear`` ``reset_parameters()`` draw the
weight from ``kaiming_uniform_(a=sqrt(5))`` — which algebraically reduces
to ``U(-1/sqrt(fan_in), +1/sqrt(fan_in))`` — and the bias from the same
``U(-1/sqrt(fan_in), ...)`` bound computed from the weight's fan-in
(torch ``nn/modules/conv.py::reset_parameters`` /
``nn/modules/linear.py``).  Flax defaults differ (lecun-normal kernels,
zero biases).  The torch arm of the offline parity experiment — the
hand-built raw ``nn.Conv2d``/``nn.Linear`` backbones in
``scripts/reproduce_synthetic.py`` and the reference's own heads (e.g.
``/root/reference/models/nfp_heads.py``; the reference backbones proper
come from timm, ``/root/reference/models/texture_pooling.py:19``) —
therefore trains from a measurably different weight distribution than
this framework's flax init.

``torch_default_init`` re-samples every ``(kernel, bias)`` pair in a flax
params tree from the torch distributions so init-sensitivity experiments
(``scripts/reproduce_synthetic.py --torch_init``) can separate
"op/protocol divergence" from "init-distribution divergence".
BatchNorm ``scale``/``bias`` (ones/zeros in both frameworks) and every
non-(kernel, bias) parameter (DeepTEN codewords, positional embeddings,
…) are left untouched.

fan_in is ``prod(kernel.shape[:-1])`` — exact for flax ``nn.Conv``
(``(kh, kw, cin/groups, cout)``, matching torch's
``in_channels/groups * kh * kw``, grouped/depthwise included) and
``nn.Dense`` (``(in, out)``).  The ViT fused-QKV ``ReshapedKernelDense``
kernel (3-D) would get an overcounted fan-in here; timm's ViT uses
trunc-normal init rather than the torch module defaults anyway, so this
transform targets the conv-net families (resnet18/50, mobilenetv3).
"""

import math

import jax
import numpy as np

__all__ = ["torch_default_init"]


def torch_default_init(variables, rng):
    """Return ``variables`` with params re-sampled from torch defaults.

    Arrays are re-drawn with jax PRNG (deterministic in ``rng``); shapes,
    dtypes and the tree structure are preserved, so the result drops into
    ``Trainer(init_variables=...)`` / ``create_train_state`` unchanged.
    Non-param collections (``batch_stats`` etc.) pass through untouched.
    """
    try:  # flax<0.8 FrozenDict trees
        from flax.core import unfreeze
        params = unfreeze(variables["params"])
    except Exception:
        params = dict(variables["params"])

    def resample(tree, key):
        if not isinstance(tree, dict):
            return tree
        out = {}
        kernel = tree.get("kernel")
        if kernel is not None and getattr(kernel, "ndim", 0) >= 2:
            bound = 1.0 / math.sqrt(float(np.prod(kernel.shape[:-1])))
            key, kw, kb = jax.random.split(key, 3)
            out["kernel"] = jax.random.uniform(
                kw, kernel.shape, kernel.dtype, -bound, bound)
            for name in sorted(tree):  # sorted: order-stable rng, both
                leaf = tree[name]      # branches (advisor round-3 note)
                if name == "kernel":
                    continue
                if name == "bias":
                    out["bias"] = jax.random.uniform(
                        kb, leaf.shape, leaf.dtype, -bound, bound)
                else:  # a sibling submodule inside the same scope
                    key, sub = jax.random.split(key)
                    out[name] = resample(leaf, sub)
            return out
        for name in sorted(tree):  # sorted: rng assignment is order-stable
            key, sub = jax.random.split(key)
            out[name] = resample(tree[name], sub)
        return out

    new = dict(variables)
    new["params"] = resample(params, rng)
    return new
