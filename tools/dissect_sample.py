"""Per-source dissection of a golden test sample (VERDICT r3 #2 ask).

For a shipped reference sample (`/root/reference/test_samples/...`,
format per reference `src/eval_syn.py:31-58`), runs the model at each
one-hot distance threshold and decomposes the estimate over the shipped
per-source solos by joint least squares:

    est ~= a0*voice00 + a1*voice01 + a_rest*(mix - voice00 - voice01)

The per-source gains (in dB re unity pass-through) separate the failure
modes the round-3 verdict asked about: radius misclassification shows up
as one in-bubble source near -inf dB while the other is near 0 dB;
speaker confusion / garbling shows up as a large unexplained residual;
distractor leakage as a_rest >> 0. Windowed gains localise time-varying
suppression.

Usage:
    python tools/dissect_sample.py /root/reference/test_samples/syn_2m/00002 \
        runs/pretrain_s3 --distance_threshold 2.0
"""
import argparse
import json
import os

import numpy as np

from sound_bubble_tpu.utils import ensure_platform as _ensure_platform


def ls_gains(est, regressors):
    """Joint least-squares gains: est ~= sum_i a_i * regressors[i]."""
    A = np.stack([r.ravel() for r in regressors], axis=1)  # [N, k]
    y = est.ravel()
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = y - A @ coef
    return coef, float(np.sum(resid ** 2) / (np.sum(y ** 2) + 1e-12))


def db(x):
    return 10.0 * np.log10(max(float(x), 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sample_dir")
    ap.add_argument("run_dir")
    ap.add_argument("--distance_threshold", type=float, default=2.0)
    ap.add_argument("--sr", type=int, default=24000)
    ap.add_argument("--win_s", type=float, default=0.5)
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args()
    _ensure_platform()

    import sound_bubble_tpu.utils as utils
    from sound_bubble_tpu.evaluation import ONE_HOT, run_testcase
    from sound_bubble_tpu.utils import read_audio_file
    from sound_bubble_tpu.metrics.metrics import Metrics

    with open(os.path.join(args.sample_dir, "metadata.json")) as f:
        metadata = json.load(f)
    mixture = read_audio_file(os.path.join(args.sample_dir, "mixture.wav"),
                              args.sr)
    solos, names = [], []
    for k in sorted(metadata):
        if not k.startswith("voice"):
            continue
        p = os.path.join(args.sample_dir, f"mic00_{k}.wav")
        if os.path.exists(p):
            solos.append(read_audio_file(p, args.sr)[0])
            names.append(k)
    mix0 = mixture[0]
    rest = mix0 - sum(solos)
    regr = solos + [rest]
    rnames = names + ["rest(distractors+bg)"]

    model = utils.load_torch_pretrained(args.run_dir).model
    model.eval()
    si_sdr = Metrics("si_sdr")

    report = {"sample": args.sample_dir, "run_dir": args.run_dir,
              "sources": {}, "thresholds": {}}
    for k in names:
        report["sources"][k] = {"dis": metadata[k]["dis"],
                                "angle": metadata[k].get("angle")}
    for k in sorted(metadata):
        if k.startswith("voice") and k not in names:
            report["sources"][k] = {"dis": metadata[k]["dis"],
                                    "angle": metadata[k].get("angle"),
                                    "solo": False}

    gt = sum(s for s, n in zip(solos, names)
             if metadata[n]["dis"] <= args.distance_threshold)[None]

    n_win = int(args.win_s * args.sr)
    for thr in sorted(ONE_HOT):
        est = run_testcase(model, mixture, None, thr)  # [1, N]
        coef, resid_frac = ls_gains(est[0], regr)
        entry = {"gains_db": {n: round(db(c ** 2), 2)
                              for n, c in zip(rnames, coef)},
                 "gains_lin": {n: round(float(c), 4)
                               for n, c in zip(rnames, coef)},
                 "resid_frac": round(resid_frac, 4)}
        if abs(thr - args.distance_threshold) < 1e-6:
            entry["si_sdr_vs_gt"] = round(
                float(si_sdr(est=est, gt=gt, mix=mix0[None])), 2)
            wins = []
            for s in range(0, len(mix0) - n_win + 1, n_win):
                c, rf = ls_gains(est[0][s:s + n_win],
                                 [r[s:s + n_win] for r in regr])
                wins.append({"t0_s": round(s / args.sr, 2),
                             **{n: round(float(v), 3)
                                for n, v in zip(rnames, c)},
                             "resid": round(rf, 3)})
            entry["windows"] = wins
        report["thresholds"][str(thr)] = entry

    print(json.dumps(report, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
