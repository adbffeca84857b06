"""Flatten/unflatten nested streaming-state dicts to named positional lists.

The bridge from dict state to positional model I/O for export runtimes
(reference `/root/reference/edge/flatbuf.py`): names are `::`-joined paths in
sorted-key order; works for numpy and jnp leaves.
"""
from __future__ import annotations

DELIMITER = "::"


def flatten_state_buffers(state_dict, prefix: str = ""):
    """-> (names, buffers), sorted depth-first by key."""
    names, bufs = [], []
    for k in sorted(state_dict.keys()):
        v = state_dict[k]
        if isinstance(v, dict):
            sub_names, sub_bufs = flatten_state_buffers(
                v, prefix=f"{prefix}{k}{DELIMITER}")
            names.extend(sub_names)
            bufs.extend(sub_bufs)
        else:
            names.append(f"{prefix}{k}")
            bufs.append(v)
    return names, bufs


def unflatten_state_buffers(state_names, state_buffers):
    """Inverse of flatten_state_buffers."""
    root: dict = {}
    for name, buf in zip(state_names, state_buffers):
        parts = name.split(DELIMITER)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = buf
    return root
