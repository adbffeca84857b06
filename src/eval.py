"""Real-world test-set evaluation CLI.

Rebuild of `/root/reference/src/eval.py`: like eval_syn minus the spatial-info
bookkeeping; `--distance_threshold -1` evaluates a non-distance-conditioned
model (no dis_embed input).
"""
import argparse
import glob
import json
import os

import numpy as np

from sound_bubble_tpu.utils import ensure_platform as _ensure_platform
import pandas as pd

import sound_bubble_tpu.utils as utils
from sound_bubble_tpu.evaluation import load_testcase as _load, run_testcase
from sound_bubble_tpu.metrics.metrics import Metrics, compute_decay


def load_testcase(sample_dir, args):
    threshold = (args.distance_threshold if args.distance_threshold != -1
                 else args.gt_threshold)
    return _load(sample_dir, args.sr, threshold)


def main(args: argparse.Namespace):
    _ensure_platform()
    os.makedirs(args.output_dir, exist_ok=True)
    sample_dirs = sorted(glob.glob(os.path.join(args.test_dir, "*")))

    model = utils.load_torch_pretrained(args.run_dir).model
    model.eval()

    snr = Metrics("snr")
    snr_i = Metrics("snr_i")
    si_snr = Metrics("si_snr")
    si_snr_i = Metrics("si_snr_i")
    si_sdr = Metrics("si_sdr")
    si_sdr_i = Metrics("si_sdr_i")

    records = []
    decays, snris, sisdris = [], [], []
    for sample_dir in sample_dirs:
        sample_name = os.path.basename(sample_dir)
        print(f"Sample: {sample_name}")
        metadata, mixture, gt, tgt_speakers, _ = load_testcase(sample_dir, args)
        n_tgt_speakers = len(tgt_speakers)
        output = run_testcase(model, mixture, None, args.distance_threshold)

        row = {"sample": sample_name, "n_tgt_speakers": n_tgt_speakers}
        if n_tgt_speakers == 0:
            row["decay"] = float(compute_decay(est=output, mix=mixture[0:1]))
            decays.append(row["decay"])
        else:
            mix0 = mixture[0:1]
            row["input_snr"] = float(snr(est=mix0, gt=gt, mix=mix0))
            row["snri"] = float(snr_i(est=output, gt=gt, mix=mix0))
            row["input_sisnr"] = float(si_snr(est=mix0, gt=gt, mix=mix0))
            row["sisnri"] = float(si_snr_i(est=output, gt=gt, mix=mix0))
            row["input_sisdr"] = float(si_sdr(est=mix0, gt=gt, mix=mix0))
            row["sisdri"] = float(si_sdr_i(est=output, gt=gt, mix=mix0))
            snris.append(row["snri"])
            sisdris.append(row["sisdri"])
            print("SI-SDR:", row["input_sisdr"], row["sisdri"],
                  "SNR:", row["input_snr"], row["snri"])
        records.append(row)

    print("DECAY = ", np.mean(decays) if decays else np.nan)
    print("SNRi: ", np.mean(snris), " SI-SDRi: ", np.mean(sisdris))

    results_df = pd.DataFrame.from_records(records)
    results_df.to_csv(os.path.join(args.output_dir, "results.csv"))
    with open(os.path.join(args.output_dir, "args.json"), "w") as f:
        json.dump(args.__dict__, f, indent=4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("test_dir", type=str, help="Path to test dataset")
    parser.add_argument("run_dir", type=str, help="Path to model run")
    parser.add_argument("output_dir", type=str,
                        help="Path to store output files")
    parser.add_argument("--distance_threshold", type=float, default=1.0,
                        help="Distance threshold; -1 = unconditioned model")
    parser.add_argument("--gt_threshold", type=float, default=1.5,
                        help="GT inclusion threshold when distance_threshold=-1")
    parser.add_argument("--sr", type=int, default=24000)
    parser.add_argument("--use_cuda", action="store_true")
    main(parser.parse_args())
