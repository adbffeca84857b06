"""Aggregate + analyze synthetic eval results.

Rebuild of `/root/reference/src/print_syn_results.py`: reads results.csv /
infos.json / args.json from `results_dir`, prints decay / per-speaker-count
SI-SDRi mean±std, and saves SI-SDRi-vs-{distance gap, angle gap, rt60} binned
error-bar plots.
"""
import argparse
import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

distances_intervals = [1, 2, 3, 4, 100]
angle_intervals = [30, 60, 90, 120, 180]
rt60_intervals = [0.2, 0.4, 0.6, 1.2]


def cal_angle_diff(near_angles, far_angles):
    a0 = near_angles[0]
    diffs = [min(abs(a1 - a0), abs(a1 - a0 - 360), abs(a1 - a0 + 360))
             for a1 in far_angles]
    return min(diffs)


def return_discrete_index(val, intervals):
    for i, bound in enumerate(intervals):
        if val < bound:
            return i
    raise ValueError("Valid input val")


def _binned_plot(bins, intervals, xlabel, path):
    x, y, y_std = [], [], []
    for i, results in enumerate(bins):
        print(intervals[i], len(results),
              np.mean(results) if results else float("nan"))
        if results:
            x.append(i)
            y.append(np.mean(results))
            y_std.append(np.std(results))
    if x:
        plt.errorbar(x, y, yerr=y_std)
        plt.xlabel(xlabel)
        plt.xticks(x, [str(intervals[i]) for i in x], rotation=90)
        plt.ylabel("SI-SDRi")
        plt.savefig(path, bbox_inches="tight")
        plt.clf()


def main(args: argparse.Namespace):
    with open(os.path.join(args.results_dir, "args.json")) as f:
        args_json = json.load(f)
    with open(os.path.join(args.results_dir, "infos.json")) as f:
        infos = json.load(f)
    print(os.path.basename(args_json["run_dir"].rstrip("/")))

    results_df = pd.read_csv(os.path.join(args.results_dir, "results.csv"))
    zero_mask = results_df["n_tgt_speakers"] == 0
    one_mask = results_df["n_tgt_speakers"] == 1
    two_mask = results_df["n_tgt_speakers"] == 2

    dis_bins = [[] for _ in distances_intervals]
    angle_bins = [[] for _ in angle_intervals]
    rt60_bins = [[] for _ in rt60_intervals]

    for i in range(results_df.shape[0]):
        sample_num = "{:05d}".format(int(results_df["sample"][i]))
        if sample_num not in infos:
            continue
        info = infos[sample_num]
        spatial, room = info["spatial"], info["room"]
        if one_mask[i] and spatial["dis_far"]:
            dis_diff = (min(spatial["dis_far"]) - max(spatial["dis_near"]))
            dis_bins[return_discrete_index(dis_diff, distances_intervals)] \
                .append(results_df["sisdri"][i])
            if all(a is not None for a in
                   spatial["angle_near"] + spatial["angle_far"]):
                angle_diff = cal_angle_diff(spatial["angle_near"],
                                            spatial["angle_far"])
                angle_bins[return_discrete_index(angle_diff, angle_intervals)] \
                    .append(results_df["sisdri"][i])
            if room and "rt60" in room:
                rt60_bins[return_discrete_index(room["rt60"], rt60_intervals)] \
                    .append(results_df["sisdri"][i])

    results_df["snro"] = results_df["snri"] + results_df["input_snr"]
    results_df["sisdro"] = results_df["sisdri"] + results_df["input_sisdr"]

    if any(zero_mask):
        d = results_df[zero_mask]["decay"]
        print(f"Decay: {np.mean(d):.02f} +/- {np.std(d):.02f}dB")
        z = results_df[zero_mask]["input_sisdr"]
        if not z.isna().all():
            print(f"Zero input SI-SDR: {np.mean(z):.02f} +/- {np.std(z):.02f}dB")
    if any(one_mask):
        s = results_df[one_mask]["sisdri"]
        print(f"Single target SI-SDRi: {np.mean(s):.02f} +/- {np.std(s):.02f}dB")
        si = results_df[one_mask]["input_sisdr"]
        print(f"Single target input SI-SDR: {np.mean(si):.02f} "
              f"+/- {np.std(si):.02f}dB")
    if any(two_mask):
        s = results_df[two_mask]["sisdri"]
        print(f"Double target SI-SDRi: {np.mean(s):.02f} +/- {np.std(s):.02f}dB")
        si = results_df[two_mask]["input_sisdr"]
        print(f"Double target input SI-SDR: {np.mean(si):.02f} "
              f"+/- {np.std(si):.02f}dB")

    _binned_plot(dis_bins, distances_intervals, "distance gap (m)",
                 os.path.join(args.results_dir, "dis_gap.png"))
    _binned_plot(angle_bins, angle_intervals, "angle gap (deg)",
                 os.path.join(args.results_dir, "angle_gap.png"))
    _binned_plot(rt60_bins, rt60_intervals, "rt60",
                 os.path.join(args.results_dir, "rt60_2.png"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("results_dir", type=str,
                        help="Directory with stored CSV file")
    main(parser.parse_args())
