"""Misc utilities (reference utils/comm_utils.py)."""

from __future__ import annotations

import gc
import random

import numpy as np

__all__ = ["set_seed", "clear_memory", "model_size_bytes"]


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def clear_memory() -> None:
    gc.collect()


def model_size_bytes(params) -> int:
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
