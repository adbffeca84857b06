"""Bubble visualization: sweep a speaker across a simulated room and plot the
model's per-position output energy (the spatial "bubble" heatmap).

Functional rebuild of `/root/reference/src/visualize_bubble.py` (the
reference script is broken by a stale import, SURVEY §2.1) on our native ISM:

  python src/visualize_bubble.py RUN_DIR OUT.png --distance_threshold 1.0 \
      --grid 13 --room 6 5 3
"""
import argparse
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import sound_bubble_tpu.utils as utils  # noqa: E402
from sound_bubble_tpu.datagen.generate import (  # noqa: E402
    HEADPHONE_MICS_CM, generate_data_scenario,
)
from sound_bubble_tpu.datagen.ism import ShoeBox  # noqa: E402
from sound_bubble_tpu.evaluation import ONE_HOT, run_testcase  # noqa: E402


def render_at(mic_positions, speaker_pos, signal, sr, room_dims, absorption,
              max_order, total_samples):
    room = ShoeBox(p=room_dims, fs=sr, max_order=max_order,
                   absorption=absorption)
    room.add_microphone_array(mic_positions.T)
    room.add_source(speaker_pos, signal=signal)
    premix = room.simulate(return_premix=True)[0]
    out = np.zeros((premix.shape[0], total_samples))
    for j in range(premix.shape[0]):
        out[j] = np.pad(premix[j], (0, total_samples))[:total_samples]
    peak = np.abs(out).max()
    return out / peak * 0.7 if peak > 0 else out


def main(args):
    utils.ensure_platform()
    np.random.seed(args.seed)
    model = utils.load_torch_pretrained(args.run_dir).model
    sr = args.sr
    total = int(args.duration * sr)
    t = np.arange(total) / sr
    signal = (np.sin(2 * np.pi * 220 * t)
              * (1 + np.sin(2 * np.pi * 3 * t))).astype(np.float64)
    signal += 0.05 * np.random.randn(total)

    room_dims = args.room
    center = np.array([room_dims[0] / 2, room_dims[1] / 2, 1.5])
    mics = HEADPHONE_MICS_CM / 100.0 + center

    xs = np.linspace(0.4, room_dims[0] - 0.4, args.grid)
    ys = np.linspace(0.4, room_dims[1] - 0.4, args.grid)
    heat = np.zeros((args.grid, args.grid))
    for iy, y in enumerate(ys):
        for ix, x in enumerate(xs):
            pos = [x, y, 1.5]
            if np.linalg.norm(np.array(pos[:2]) - center[:2]) < 0.25:
                heat[iy, ix] = np.nan
                continue
            mixture = render_at(mics, pos, signal, sr, room_dims,
                                args.absorption, args.max_order, total)
            out = run_testcase(model, mixture, None, args.distance_threshold)
            p_in = np.sum(mixture[0] ** 2)
            p_out = np.sum(out ** 2)
            heat[iy, ix] = 10 * np.log10(p_out / (p_in + 1e-12) + 1e-12)
            print(f"({x:.2f},{y:.2f}) d="
                  f"{np.linalg.norm(np.array(pos[:2]) - center[:2]):.2f}m "
                  f"gain={heat[iy, ix]:.1f}dB")

    plt.figure(figsize=(7, 5.5))
    plt.imshow(heat, origin="lower", extent=[xs[0], xs[-1], ys[0], ys[-1]],
               cmap="RdBu_r")
    plt.colorbar(label="output/input energy (dB)")
    circle = plt.Circle(center[:2], args.distance_threshold, fill=False,
                        color="k", linestyle="--")
    plt.gca().add_patch(circle)
    plt.scatter([center[0]], [center[1]], marker="x", c="k")
    plt.title(f"Sound bubble @ {args.distance_threshold} m")
    plt.xlabel("x (m)")
    plt.ylabel("y (m)")
    plt.savefig(args.output, bbox_inches="tight", dpi=120)
    print("saved", args.output)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", type=str)
    p.add_argument("output", type=str)
    p.add_argument("--distance_threshold", type=float, default=1.0)
    p.add_argument("--grid", type=int, default=13)
    p.add_argument("--room", type=float, nargs=3, default=[6.0, 5.0, 3.0])
    p.add_argument("--absorption", type=float, default=0.5)
    p.add_argument("--max_order", type=int, default=17)
    p.add_argument("--duration", type=float, default=1.0)
    p.add_argument("--sr", type=int, default=24000)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
