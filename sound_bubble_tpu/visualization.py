"""Scene visualization (reference `helpers/visualization.py`): room diagram
with mic array, sources colored by bubble membership, and the bubble circle.
Matplotlib-only (no interactive audio-click handler in headless use)."""
from __future__ import annotations

import numpy as np


def plot_scene(metadata: dict, dis_threshold: float = 1.0, out_path=None,
               ax=None):
    import matplotlib
    if out_path is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(6, 5))
    mics = np.array([metadata[k]["position"] for k in sorted(metadata)
                     if k.startswith("mic")])
    center = mics[:, :2].mean(axis=0)
    ax.scatter(mics[:, 0], mics[:, 1], marker="x", c="g", label="mics")
    for k in sorted(metadata):
        if not k.startswith("voice"):
            continue
        v = metadata[k]
        d = v["dis"] / 100 if metadata.get("real") else v["dis"]
        pos = v["position"]
        inside = d <= dis_threshold
        ax.scatter([pos[0]], [pos[1]], marker="o",
                   c="tab:blue" if inside else "tab:red")
        ax.annotate(f"{k[-2:]} ({d:.1f}m)", (pos[0], pos[1]),
                    textcoords="offset points", xytext=(4, 4), fontsize=8)
    ax.add_patch(plt.Circle(center, dis_threshold, fill=False,
                            linestyle="--", color="k"))
    walls = metadata.get("room_info", {}).get("walls")
    if walls:
        left, right, top, bottom = walls
        ax.set_xlim(left - 0.3, right + 0.3)
        ax.set_ylim(bottom - 0.3, top + 0.3)
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    if out_path is not None:
        ax.figure.savefig(out_path, bbox_inches="tight", dpi=120)
    return ax
