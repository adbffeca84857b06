"""Held-out synthetic eval sets for the parity campaign.

Per radius (1 / 1.5 / 2 m): N test samples split into 0/1/2-in-bubble thirds,
rendered by the HOST image-source pipeline (`datagen.generate.generate_sample`
— the reference `generate_adaptive_dataset.py` semantics). The training
campaign synthesizes its data on-device (`datagen.campaign`), so this set is
both held-out AND an independent acoustic implementation: a model that scores
well here generalizes across the two simulators.

  python datasets/make_eval_set.py --out data_eval --n 60 --duration 2.5
"""
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data_eval")
    p.add_argument("--n", type=int, default=60, help="samples per radius")
    p.add_argument("--duration", type=float, default=2.5)
    p.add_argument("--sr", type=int, default=24000)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--snr_min", type=float, default=-5.0,
                   help="reference test_target_snr_min")
    p.add_argument("--snr_max", type=float, default=5.0)
    p.add_argument("--max_order_min", type=int, default=10)
    p.add_argument("--max_order_max", type=int, default=40)
    p.add_argument("--bg_noise", type=float, default=0.0,
                   help="probability a sample carries far-field background "
                        "noise (colored noise through the huge second room "
                        "— reference n_BG in {0,1} semantics)")
    p.add_argument("--voice", default="formant",
                   choices=("formant", "harmonic"),
                   help="source model (formant = datagen.voice, round 3; "
                        "harmonic = round-2 quasi-speech)")
    args = p.parse_args()

    from sound_bubble_tpu.datagen.generate import generate_sample
    # sibling import by path: the repo's datasets/ dir is not a package (and
    # must not shadow the installed HF `datasets` library)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_test_samples",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "make_test_samples.py"))
    mts = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mts)
    if args.voice == "formant":
        from sound_bubble_tpu.datagen.voice import formant_speechlike
        speechlike = formant_speechlike
    else:
        speechlike = mts.speechlike

    radii = {"syn_1m": 1.0, "syn_1_5m": 1.5, "syn_2m": 2.0}
    n_samp = int(args.duration * args.sr)
    for name, radius in radii.items():
        rng = np.random.default_rng(args.seed + int(radius * 10))
        for i in range(args.n):
            n_in = i * 3 // args.n          # thirds: 0, 1, 2 in-bubble
            np.random.seed(int(rng.integers(0, 2 ** 31 - 1)))
            clips = [(speechlike(rng, n_samp, args.sr), f"synth{j}")
                     for j in range(n_in + 2)]
            noise_data = None
            # (guarded so --bg_noise 0 leaves the rng stream — and thus
            # previously generated eval sets — bit-identical)
            if args.bg_noise > 0 and rng.random() < args.bg_noise:
                # colored-noise ambience (same recipe as the on-device
                # campaign's BG slot: beta~U(0,2) + slow AM)
                from sound_bubble_tpu.ops.noise import powerlaw_psd_gaussian
                beta = rng.uniform(0.0, 2.0)
                noise_data = powerlaw_psd_gaussian(beta, n_samp, rng=rng)
                t = np.arange(n_samp) / args.sr
                depth = rng.uniform(0.0, 0.5)
                fm, ph = rng.uniform(0.1, 1.0), rng.uniform(0, 2 * np.pi)
                noise_data = noise_data * (
                    1.0 - depth * (0.5 + 0.5 * np.sin(2 * np.pi * fm * t
                                                      + ph)))
            out_dir = os.path.join(args.out, name, "test", f"{i:05d}")
            if os.path.exists(os.path.join(out_dir, "metadata.json")):
                continue
            generate_sample(
                clips, noise_data, n_in, output_dir=out_dir, sr=args.sr,
                duration=args.duration, n_out_range=(1, 2),
                dis_threshold=radius,
                snr_range=(args.snr_min, args.snr_max),
                max_order_range=(args.max_order_min, args.max_order_max))
            if (i + 1) % 10 == 0:
                print(f"{name}: {i + 1}/{args.n}", flush=True)


if __name__ == "__main__":
    main()
