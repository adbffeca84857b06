"""Single-file checkpoints (last.pt / best.pt policy like the reference).

The file layout mirrors the reference's torch checkpoint dict
(`/root/reference/src/hl_modules/distance_based_hl_module.py:141-156`):
{model, optimizer, current_epoch, metric_values, statistics, scheduler} —
pickled with numpy leaves (portable across jax versions; `.pt` names kept so
run dirs look identical to the reference's).
"""
from __future__ import annotations

import pickle

import jax
import numpy as np


def to_numpy_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state: dict) -> None:
    with open(path, "wb") as f:
        pickle.dump(to_numpy_tree(state), f, protocol=4)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
