"""Synthetic test-set evaluation CLI.

Argument- and output-compatible rebuild of `/root/reference/src/eval_syn.py`:
positional test_dir run_dir output_dir; --distance_threshold --sr --save_id
--use_cuda; writes results.csv / infos.json / args.json and prints the same
summary lines (decay for empty-bubble samples; SNR/SI-SNR/SI-SDR (+i), STOI,
PESQ otherwise).
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
from sound_bubble_tpu.utils import save_audio_file


def load_testcase(sample_dir, args):
    return _load(sample_dir, args.sr, args.distance_threshold)


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
    pesq = Metrics("PESQ")
    stoi = Metrics("STOI")

    snr_ins, snris, sisdr_ins, sisdris, decays = [], [], [], [], []
    pesqs, stois, pesq_ins, stoi_ins = [], [], [], []
    records, infos = [], {}

    for sample_dir in sample_dirs:
        sample_name = os.path.basename(sample_dir)
        if args.save_id >= 0:
            sample_name = "{:06d}".format(args.save_id)
            sample_dir = os.path.join(args.test_dir, sample_name)
        print(f"Sample: {sample_name}", sample_dir)

        metadata, mixture, gt, tgt_speakers, spatial_info = load_testcase(
            sample_dir, args)
        n_tgt_speakers = len(tgt_speakers)
        output = run_testcase(model, mixture, None, args.distance_threshold)

        row = {"sample": sample_name, "n_tgt_speakers": n_tgt_speakers}
        infos[sample_name] = {"room": metadata.get("room_info"),
                              "spatial": spatial_info}

        if n_tgt_speakers == 0:
            row["decay"] = float(compute_decay(est=output, mix=mixture[0:1]))
            print("Decay:", row["decay"])
            decays.append(row["decay"])
        else:
            mix0 = mixture[0:1]
            row["input_snr"] = float(snr(est=mix0, gt=gt, mix=mix0))
            row["snri"] = float(snr_i(est=output, gt=gt, mix=mix0))
            row["input_sisnr"] = float(si_snr(est=mix0, gt=gt, mix=mix0))
            row["sisnri"] = float(si_snr_i(est=output, gt=gt, mix=mix0))
            row["input_sisdr"] = float(si_sdr(est=mix0, gt=gt, mix=mix0))
            row["sisdri"] = float(si_sdr_i(est=output, gt=gt, mix=mix0))
            row["stoi_in"] = float(stoi(est=mix0, gt=gt, mix=mix0))
            row["pesq_in"] = float(pesq(est=mix0, gt=gt, mix=mix0))
            row["stoi"] = float(stoi(est=output, gt=gt, mix=mix0))
            row["pesq"] = float(pesq(est=output, gt=gt, mix=mix0))

            snr_ins.append(row["input_snr"])
            snris.append(row["snri"])
            sisdr_ins.append(row["input_sisdr"])
            sisdris.append(row["sisdri"])
            pesqs.append(row["pesq"])
            stois.append(row["stoi"])
            pesq_ins.append(row["pesq_in"])
            stoi_ins.append(row["stoi_in"])
            print("SI-SDR:", row["input_sisdr"], row["sisdri"],
                  "SNR: ", row["input_snr"], row["snri"])
            print("pesq_in=", row["pesq_in"], "pesq=", row["pesq"])
            print("stoi_in=", row["stoi_in"], "stoi=", row["stoi"])

        if args.save_id >= 0:
            os.makedirs("./debug", exist_ok=True)
            save_audio_file("./debug/mix" + sample_name + ".wav",
                            mixture[0:1], sample_rate=args.sr, rescale=False)
            save_audio_file("./debug/est" + sample_name + ".wav", output,
                            sample_rate=args.sr, rescale=False)
            save_audio_file("./debug/gt" + sample_name + ".wav", gt,
                            sample_rate=args.sr, rescale=False)
        records.append(row)
        if args.save_id < 0:
            # rewrite incrementally so a deadline/stall kill mid-set still
            # leaves every finished sample on disk (the campaign driver's
            # per-radius watchdog boxes make end-only writes lossy)
            pd.DataFrame.from_records(records).to_csv(
                os.path.join(args.output_dir, "results.csv"))
        if args.save_id >= 0:
            break

    print("DECAY = ", np.mean(decays) if decays else np.nan)
    print("SNR: ", np.mean(snr_ins), np.mean(snris))
    print("SISDR: ", np.mean(sisdr_ins), np.mean(sisdris))
    print("pesq = ", np.mean(pesq_ins), np.mean(pesqs))
    print("stoi = ", np.mean(stoi_ins), np.mean(stois))

    if args.save_id < 0:
        results_df = pd.DataFrame.from_records(records)
        results_df.to_csv(os.path.join(args.output_dir, "results.csv"))
        with open(os.path.join(args.output_dir, "infos.json"), "w") as f:
            json.dump(infos, f, indent=4)
        with open(os.path.join(args.output_dir, "args.json"), "w") as f:
            json.dump(args.__dict__, f, indent=4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("test_dir", type=str, help="Path to test dataset")
    parser.add_argument("run_dir", type=str, help="Path to model run")
    parser.add_argument("output_dir", type=str,
                        help="Path to store output files")
    parser.add_argument("--distance_threshold", type=float, default=1.0,
                        help="Distance threshold to include/exclude speakers")
    parser.add_argument("--sr", type=int, default=24000,
                        help="Project sampling rate")
    parser.add_argument("--save_id", type=int, default=-1)
    parser.add_argument("--use_cuda", action="store_true",
                        help="Accepted for CLI compatibility (TPU/CPU here)")
    main(parser.parse_args())
