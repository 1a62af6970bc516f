"""Checkpoint/resume for streaming pipeline state.

The reference has no serialization at all; its only persistent state is
the de-emphasis filter memory and ring indices (SURVEY.md §5). Here the
whole streaming state is an explicit pytree, so checkpointing is a flat
npz round-trip keyed by tree paths — sufficient for seamless resume of a
receiver (no audio discontinuity beyond the chunk boundary).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax


def _flatten(tree: Any):
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    flat = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat, treedef


def save_state(path: str, state: Any) -> None:
    """Serialize a state pytree to ``path`` (npz)."""
    flat, _ = _flatten(state)
    np.savez(path, **flat)


def load_state(path: str, like: Any) -> Any:
    """Load a state pytree saved by :func:`save_state`.

    ``like`` provides the tree structure (e.g. a freshly-initialized
    state); array shapes/dtypes are validated against it.
    """
    data = np.load(path)
    flat_like, treedef = _flatten(like)
    leaves = []
    for key, ref in flat_like.items():
        if key not in data:
            raise KeyError(f"checkpoint missing state entry {key!r}")
        arr = data[key]
        if arr.shape != ref.shape:
            raise ValueError(
                f"checkpoint entry {key!r} shape {arr.shape} != {ref.shape}")
        leaves.append(arr.astype(ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
