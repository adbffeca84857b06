"""Aggregate real-world eval results (rebuild of
`/root/reference/src/print_results.py`): reads results.csv + args.json from
`results_dir`, prints decay and per-speaker-count SI-SDRi summaries, and
writes the analysis plots.

The reference file carries the plotting surface in partially dead code (an
early `return` at `print_results.py:72` and a commented correlation block at
`:30-44`); this rebuild ships it working:
  - sisdri_vs_room.png        room-wise SI-SDRi bars (`:121-125`)
  - input_vs_output_si_sdr.png  per-room input-vs-output scatter + y=x
    (`:128-136`)
  - <metric>_corr.png         snro/sisdro vs pesq/stoi correlation panels
    with Pearson r / Spearman rho printed (`:31-44`)
Plots degrade gracefully: panels whose columns are absent (e.g. `room` for
synthetic sets) are skipped.
"""
import argparse
import json
import os

import numpy as np
import pandas as pd


def print_summaries(results_df):
    zero_mask = results_df["n_tgt_speakers"] == 0
    one_mask = results_df["n_tgt_speakers"] == 1
    two_mask = results_df["n_tgt_speakers"] == 2

    if any(zero_mask):
        d = results_df[zero_mask]["decay"]
        print(f"Decay: {np.mean(d):.02f} +/- {np.std(d):.02f}dB")
    if any(one_mask):
        s = results_df[one_mask]["sisdri"]
        print(f"Single target SI-SDRi: {np.mean(s):.02f} "
              f"+/- {np.std(s):.02f}dB")
        si = results_df[one_mask]["input_sisdr"]
        print(f"Single target input SI-SDR: {np.mean(si):.02f} "
              f"+/- {np.std(si):.02f}dB")
    if any(two_mask):
        s = results_df[two_mask]["sisdri"]
        print(f"Double target SI-SDRi: {np.mean(s):.02f} "
              f"+/- {np.std(s):.02f}dB")
        si = results_df[two_mask]["input_sisdr"]
        print(f"Double target input SI-SDR: {np.mean(si):.02f} "
              f"+/- {np.std(si):.02f}dB")


def write_plots(results_df, out_dir):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import scipy.stats
    except ImportError as e:
        print(f"plot dependencies unavailable ({e.name}) — skipping plots")
        return []

    written = []
    one_mask = results_df["n_tgt_speakers"] == 1
    two_mask = results_df["n_tgt_speakers"] == 2
    non_zero = one_mask | two_mask

    # correlation panels (`print_results.py:31-44`)
    y_lists = [y for y in ("pesq", "stoi") if y in results_df]
    for x in ("snro", "sisdro"):
        if x not in results_df or not y_lists:
            continue
        df = results_df[non_zero].dropna(subset=[x] + y_lists)
        if len(df) < 3:
            continue
        plt.figure(figsize=(8, 4))
        for yi, y in enumerate(y_lists):
            r = scipy.stats.pearsonr(df[x], df[y])
            rho = scipy.stats.spearmanr(df[x], df[y])
            print(x, y, "r=", r[0], "rho=", rho[0])
            plt.subplot(1, len(y_lists), yi + 1)
            plt.scatter(df[x], df[y], s=4)
            plt.xlabel(x)
            plt.ylabel(y)
            plt.title(f"r={r[0]:.2f} rho={rho[0]:.2f}")
        plt.tight_layout()
        path = os.path.join(out_dir, x + "_corr.png")
        plt.savefig(path)
        plt.close()
        written.append(path)

    # room-wise bars + per-room scatter (`print_results.py:75-141`)
    if "room" in results_df:
        rooms = list(results_df["room"].unique())
        sisdri_list = []
        for room in rooms:
            df = results_df[results_df["room"] == room]
            if "stoi" in df:
                print(f"[{room}] STOI: {np.mean(df['stoi']):.03f}"
                      f"+/-{np.std(df['stoi']):.03f}")
            if "pesq" in df:
                print(f"[{room}] PESQ: {np.mean(df['pesq']):.03f}"
                      f"+/-{np.std(df['pesq']):.03f}")
            sisdri_list.append(np.mean(df["sisdri"]))

        plt.figure()
        plt.bar(rooms, sisdri_list)
        plt.xlabel("Room name")
        plt.ylabel("SI-SDRi")
        path = os.path.join(out_dir, "sisdri_vs_room.png")
        plt.savefig(path)
        plt.close()
        written.append(path)

        plt.figure()
        for room in rooms:
            df = results_df[(results_df["room"] == room) & one_mask]
            plt.scatter(df["input_sisdr"], df["sisdri"] + df["input_sisdr"],
                        label=room, s=0.5)
        lim = results_df[one_mask]["input_sisdr"]
        if len(lim):
            plt.plot([lim.min(), lim.max()], [lim.min(), lim.max()],
                     color="green")
        plt.legend()
        plt.xlabel("Input SI-SDR")
        plt.ylabel("Output SI-SDR")
        path = os.path.join(out_dir, "input_vs_output_si_sdr.png")
        plt.savefig(path)
        plt.close()
        written.append(path)
    elif one_mask.any():
        # synthetic sets have no rooms; still ship the scatter
        plt.figure()
        df = results_df[one_mask]
        plt.scatter(df["input_sisdr"], df["sisdri"] + df["input_sisdr"], s=2)
        lim = df["input_sisdr"]
        plt.plot([lim.min(), lim.max()], [lim.min(), lim.max()],
                 color="green")
        plt.xlabel("Input SI-SDR")
        plt.ylabel("Output SI-SDR")
        path = os.path.join(out_dir, "input_vs_output_si_sdr.png")
        plt.savefig(path)
        plt.close()
        written.append(path)
    return written


def main(args: argparse.Namespace):
    with open(os.path.join(args.results_dir, "args.json")) as f:
        args_json = json.load(f)
    run_name = os.path.basename(args_json["run_dir"].rstrip("/"))
    print(f"Results for model: {run_name}")

    results_df = pd.read_csv(os.path.join(args.results_dir, "results.csv"))
    if "snri" in results_df and "input_snr" in results_df:
        results_df["snro"] = results_df["snri"] + results_df["input_snr"]
        results_df["sisdro"] = results_df["sisdri"] + results_df["input_sisdr"]

    print_summaries(results_df)
    if not args.no_plots:
        for path in write_plots(results_df, args.results_dir):
            print("wrote", path)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("results_dir", type=str,
                        help="Directory with stored CSV file")
    parser.add_argument("--no_plots", action="store_true")
    main(parser.parse_args())
