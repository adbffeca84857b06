"""Regenerate the in-repo golden sample sets (test_samples/{syn_1m,syn_1_5m,
syn_2m}/0000{0,1,2}) with the native room simulator: per radius, three
scenarios covering 0 / 1 / 2 in-bubble speakers (the reference's golden
layout, README.md:39-43). Sources are synthetic speech-like signals so the
fixtures are license-free and small.

  python datasets/make_test_samples.py [--out test_samples] [--duration 2.0]
"""
import argparse
import os

import numpy as np


def speechlike(rng, n, sr):
    """Modulated multi-band noise with pauses — enough structure for the
    separation demo pipeline to be meaningful."""
    t = np.arange(n) / sr
    f0 = rng.uniform(110, 220)
    sig = np.zeros(n)
    for k in range(1, 6):
        sig += rng.uniform(0.3, 1.0) / k * np.sin(
            2 * np.pi * f0 * k * t + rng.uniform(0, 6.28))
    sig *= 1 + 0.8 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
    # pauses
    env = (np.sin(2 * np.pi * rng.uniform(0.3, 0.7) * t
                  + rng.uniform(0, 6.28)) > -0.7).astype(float)
    sig = sig * env + 0.02 * rng.standard_normal(n)
    return sig / np.abs(sig).max()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="test_samples")
    p.add_argument("--duration", type=float, default=2.0)
    p.add_argument("--sr", type=int, default=24000)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    from sound_bubble_tpu.datagen.generate import generate_sample

    radii = {"syn_1m": 1.0, "syn_1_5m": 1.5, "syn_2m": 2.0}
    rng = np.random.default_rng(args.seed)
    n = int(args.duration * args.sr)
    for name, radius in radii.items():
        for idx, n_in in enumerate([0, 1, 2]):
            np.random.seed(args.seed + idx * 7 + int(radius * 10))
            clips = [(speechlike(rng, n, args.sr), f"synth{j}")
                     for j in range(n_in + 2)]
            out_dir = os.path.join(args.out, name, f"{idx:05d}")
            generate_sample(clips, None, n_in, output_dir=out_dir,
                            sr=args.sr, duration=args.duration,
                            n_out_range=(2, 2), dis_threshold=radius,
                            snr_range=(-5, 5), max_order_range=(10, 40))
            print("wrote", out_dir)


if __name__ == "__main__":
    main()
