"""Small shared helpers (the reference's ``lib/pytorch_misc.py`` grab-bag).

Most of that file's machinery dissolved into first-class components here
(optimizers → ``train/state``, checkpointing → ``train/checkpoint``, box
utils → ``ops/boxes``, eval helpers → ``eval/sgg_eval``, ragged iteration →
padded batches). What remains generic lives here: the parameter table
(``print_para``, pytorch_misc.py:398-416), seeding, and pytree size
accounting.
"""

from __future__ import annotations

import random
from typing import Any

import numpy as np


def set_seed(seed: int):
    """Seed host-side RNGs (reference set_seed, pytorch_misc.py:673-679).
    Device randomness is handled by explicit jax.random keys."""
    random.seed(seed)
    np.random.seed(seed)


def param_count(params: Any) -> int:
    import jax
    return int(sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(params)
                   if hasattr(p, "shape")))


def print_params(params: Any, max_rows: int = 100) -> str:
    """Parameter table sorted by size (reference print_para)."""
    import jax
    rows = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not hasattr(leaf, "shape"):
            continue
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        rows.append((name, tuple(leaf.shape), int(np.prod(leaf.shape))))
    rows.sort(key=lambda r: -r[2])
    total = sum(r[2] for r in rows)
    lines = [f"{'name':60s} {'shape':>20s} {'params':>12s}"]
    for name, shape, n in rows[:max_rows]:
        lines.append(f"{name[:60]:60s} {str(shape):>20s} {n:>12,d}")
    if len(rows) > max_rows:
        lines.append(f"... {len(rows) - max_rows} more")
    lines.append(f"{'TOTAL':60s} {'':>20s} {total:>12,d}")
    out = "\n".join(lines)
    print(out)
    return out
