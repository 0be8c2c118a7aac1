"""Pytree checkpointing: atomic .npz snapshots of arbitrary JAX pytrees.

The reference's only persisted intermediate is the ``.parsed`` scene cache
(``raytracing.c:76-81``); renders are all-or-nothing. Here any pytree — a
``Scene`` mid-optimization, an optimizer state, or a partial sample
accumulation (radiance sum + sample count + RNG seed) — can be snapshotted
and restored, so multi-hour multi-host jobs survive preemption.

Format: a single ``.npz`` holding the flattened leaves by index, written via
a temp file + ``os.replace`` so a crash mid-write never corrupts the latest
checkpoint. The treedef is NOT serialized; restore requires a template pytree
with the same structure (the normal JAX idiom — structure lives in code).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any, step: int | None = None) -> None:
    """Atomically write ``tree``'s leaves (and optional step counter) to .npz."""
    leaves = jax.tree_util.tree_leaves(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if step is not None:
        payload["__step__"] = np.asarray(step)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str, template: Any) -> tuple[Any, int | None]:
    """Restore a pytree saved by :func:`save_pytree`.

    ``template`` supplies the tree structure (leaf count must match).
    Returns ``(tree, step)``; ``step`` is ``None`` if none was saved.
    """
    with np.load(path) as data:
        step = int(data["__step__"]) if "__step__" in data else None
        leaves_t, treedef = jax.tree_util.tree_flatten(template)
        n = len(leaves_t)
        loaded = [data[f"leaf_{i}"] for i in range(n)]
    restored = [
        jax.numpy.asarray(x, dtype=t.dtype) if hasattr(t, "dtype") else x
        for x, t in zip(loaded, leaves_t)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored), step
