"""Model summary: the ``torchinfo.summary`` equivalent
(``/root/reference/demo.py:354-363``) for Flax variable trees."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

__all__ = ["count_parameters", "summarize"]


def count_parameters(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def _walk(tree, prefix: Tuple[str, ...] = ()) -> List[Tuple[str, int]]:
    rows = []
    if isinstance(tree, dict):
        total = 0
        for k in sorted(tree):
            sub = _walk(tree[k], prefix + (k,))
            rows.extend(sub)
        return rows
    rows.append(("/".join(prefix), int(np.prod(tree.shape))))
    return rows


def summarize(variables: Dict[str, Any], max_depth: int = 2) -> str:
    """Readable per-module parameter-count table."""
    params = variables.get("params", variables)
    leaf_rows = _walk(params)
    groups: Dict[str, int] = {}
    for path, n in leaf_rows:
        key = "/".join(path.split("/")[:max_depth])
        groups[key] = groups.get(key, 0) + n
    width = max((len(k) for k in groups), default=10) + 2
    lines = [f"{'Module':<{width}}  Params", "=" * (width + 10)]
    for k in sorted(groups):
        lines.append(f"{k:<{width}}  {groups[k]:,}")
    total = count_parameters(params)
    stats = variables.get("batch_stats", {})
    n_stats = count_parameters(stats) if stats else 0
    lines.append("=" * (width + 10))
    lines.append(f"{'Total trainable':<{width}}  {total:,}")
    if n_stats:
        lines.append(f"{'BatchNorm stats':<{width}}  {n_stats:,}")
    return "\n".join(lines)
