"""Quick demo CLI over the in-repo golden sample sets.

Rebuild of `/root/reference/src/test_samples.py`: positional test_dir run_dir;
--distance_threshold selects the bubble radius (one-hot conditioning), prints
per-sample and mean metrics; no files written unless --save_id.
"""
import argparse
import glob
import os

import numpy as np

from sound_bubble_tpu.utils import ensure_platform as _ensure_platform

import sound_bubble_tpu.utils as utils
from sound_bubble_tpu.evaluation import load_testcase as _load, run_testcase
from sound_bubble_tpu.metrics.metrics import Metrics, compute_decay
from sound_bubble_tpu.utils import save_audio_file


def load_testcase(sample_dir, args):
    return _load(sample_dir, args.sr, args.distance_threshold)


def main(args: argparse.Namespace):
    _ensure_platform()
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

        if n_tgt_speakers == 0:
            decay = float(compute_decay(est=output, mix=mixture[0:1]))
            print("Decay:", decay)
            decays.append(decay)
        else:
            mix0 = mixture[0:1]
            input_snr = float(snr(est=mix0, gt=gt, mix=mix0))
            snri = float(snr_i(est=output, gt=gt, mix=mix0))
            input_sisdr = float(si_sdr(est=mix0, gt=gt, mix=mix0))
            sisdri = float(si_sdr_i(est=output, gt=gt, mix=mix0))
            stoi_in = float(stoi(est=mix0, gt=gt, mix=mix0))
            pesq_in = float(pesq(est=mix0, gt=gt, mix=mix0))
            stoi_v = float(stoi(est=output, gt=gt, mix=mix0))
            pesq_v = float(pesq(est=output, gt=gt, mix=mix0))

            snr_ins.append(input_snr)
            snris.append(snri)
            sisdr_ins.append(input_sisdr)
            sisdris.append(sisdri)
            pesqs.append(pesq_v)
            stois.append(stoi_v)
            pesq_ins.append(pesq_in)
            stoi_ins.append(stoi_in)
            print("SI-SDR:", input_sisdr, sisdri, "SNR: ", input_snr, snri)
            print("pesq_in=", pesq_in, "pesq=", pesq_v)
            print("stoi_in=", stoi_in, "stoi=", stoi_v)

        if args.save_id >= 0:
            os.makedirs("./debug", exist_ok=True)
            save_audio_file("./debug/mix" + sample_name + ".wav", mixture[0:1],
                            sample_rate=args.sr, rescale=False)
            save_audio_file("./debug/est" + sample_name + ".wav", output,
                            sample_rate=args.sr, rescale=False)
            save_audio_file("./debug/gt" + sample_name + ".wav", gt,
                            sample_rate=args.sr, rescale=False)
            break

    print("DECAY = ", np.mean(decays) if decays else np.nan)
    print("SNR: ", np.mean(snr_ins), np.mean(snris))
    print("SISDR: ", np.mean(sisdr_ins), np.mean(sisdris))
    print("pesq = ", np.mean(pesq_ins), np.mean(pesqs))
    print("stoi = ", np.mean(stoi_ins), np.mean(stois))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("test_dir", type=str, help="Path to test dataset")
    parser.add_argument("run_dir", type=str, help="Path to model run")
    parser.add_argument("--distance_threshold", type=float, default=1.0,
                        help="Distance threshold to include/exclude speakers")
    parser.add_argument("--sr", type=int, default=24000,
                        help="Project sampling rate")
    parser.add_argument("--save_id", type=int, default=-1)
    parser.add_argument("--use_cuda", action="store_true")
    main(parser.parse_args())
