"""Aggregate real-world eval results (rebuild of
`/root/reference/src/print_results.py`): reads results.csv + args.json from
`results_dir`, prints decay and per-speaker-count SI-SDRi summaries."""
import argparse
import json
import os

import numpy as np
import pandas as pd


def main(args: argparse.Namespace):
    with open(os.path.join(args.results_dir, "args.json")) as f:
        args_json = json.load(f)
    run_name = os.path.basename(args_json["run_dir"].rstrip("/"))
    print(f"Results for model: {run_name}")

    results_df = pd.read_csv(os.path.join(args.results_dir, "results.csv"))
    zero_mask = results_df["n_tgt_speakers"] == 0
    one_mask = results_df["n_tgt_speakers"] == 1
    two_mask = results_df["n_tgt_speakers"] == 2

    if "snri" in results_df and "input_snr" in results_df:
        results_df["snro"] = results_df["snri"] + results_df["input_snr"]
        results_df["sisdro"] = results_df["sisdri"] + results_df["input_sisdr"]

    if any(zero_mask):
        d = results_df[zero_mask]["decay"]
        print(f"Decay: {np.mean(d):.02f} +/- {np.std(d):.02f}dB")
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


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("results_dir", type=str,
                        help="Directory with stored CSV file")
    main(parser.parse_args())
