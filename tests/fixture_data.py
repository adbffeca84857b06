"""Synthetic sample-dir fixtures in the reference data format (SURVEY §2.8):
<root>/<radius_name>/<split>/NNNNN/{mixture.wav, mic00_voiceXX.wav,
metadata.json}. Signals are random band-limited noise with per-mic delays —
enough to exercise datasets/training/eval plumbing hermetically.
"""
from __future__ import annotations

import json
import os

import numpy as np

from sound_bubble_tpu.data.audio_io import write_audio_file


def make_sample(sample_dir, rng, n_mics=6, sr=24000, duration=0.5,
                dists=(0.8, 2.5), n_bg=1):
    os.makedirs(sample_dir, exist_ok=True)
    t = int(duration * sr)
    mixture = np.zeros((n_mics, t), np.float32)
    metadata = {}
    for m in range(n_mics):
        metadata[f"mic{m:02d}"] = {"position": [0.1 * m, 0.0, 1.5]}
    for v, dis in enumerate(dists):
        src = rng.standard_normal(t).astype(np.float32) * 0.1
        # cheap smoothing => speech-ish spectrum
        src = np.convolve(src, np.ones(8) / 8, mode="same")
        gt = np.zeros((1, t), np.float32)
        gt[0] = src
        write_audio_file(os.path.join(sample_dir, f"mic00_voice{v:02d}.wav"),
                         gt, sr, subtype="FLOAT")
        for m in range(n_mics):
            d = m + int(dis * 10)
            mixture[m] += np.roll(src, d) * (1.0 / (1.0 + 0.2 * m))
        metadata[f"voice{v:02d}"] = {
            "dis": float(dis), "angle": float(v),
            "speaker_id": f"spk{v}", "position": [dis, 0.0, 1.5],
        }
    if n_bg:
        mixture += 0.01 * rng.standard_normal(mixture.shape).astype(np.float32)
    write_audio_file(os.path.join(sample_dir, "mixture.wav"), mixture, sr,
                     subtype="FLOAT")
    metadata.update({
        "real": False, "n_in": sum(d <= 1.0 for d in dists),
        "n_out": sum(d > 1.0 for d in dists), "n_BG": n_bg,
        "input_snr": 5.0, "snr_clipped": False,
        "room_info": {"walls": [6.0, 5.0, 3.0], "absorption": 0.5,
                      "max_order": 20, "rt60": 0.3},
    })
    with open(os.path.join(sample_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f)
    return sample_dir


def make_synthetic_dataset(root, radius_name="syn_1m", split="train",
                           n_samples=4, seed=0, **kwargs):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, radius_name, split)
    scenarios = [(0.8, 2.5), (0.7, 0.9, 3.0), (2.5, 3.0), (0.5,)]
    for i in range(n_samples):
        make_sample(os.path.join(base, f"{i:05d}"), rng,
                    dists=scenarios[i % len(scenarios)], **kwargs)
    return base
