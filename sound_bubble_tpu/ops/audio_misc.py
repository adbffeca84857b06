"""Small DSP helpers (reference `helpers/core.py` julius excerpt and
`helpers/eval_utils.py` numpy metrics)."""
from __future__ import annotations

import math

import numpy as np


def sinc(x: np.ndarray) -> np.ndarray:
    return np.sinc(x / np.pi)  # unnormalized sinc(x) = sin(x)/x


def hz_to_mel(freqs):
    return 2595.0 * np.log10(1.0 + np.asarray(freqs) / 700.0)


def mel_to_hz(mels):
    return 700.0 * (10.0 ** (np.asarray(mels) / 2595.0) - 1.0)


def volume(x: np.ndarray) -> float:
    """RMS volume in dBFS."""
    return float(10 * np.log10(np.mean(np.asarray(x) ** 2) + 1e-12))


def pure_tone(freq: float, sr: float = 128, dur: float = 1.0):
    time = np.arange(int(sr * dur)) / sr
    return np.cos(2 * math.pi * freq * time)


# ---- numpy eval metrics (reference helpers/eval_utils.py) ----

def snr(est: np.ndarray, gt: np.ndarray) -> float:
    return float(10 * np.log10(np.sum(gt ** 2)
                               / (np.sum((est - gt) ** 2) + 1e-12) + 1e-12))


def si_sdr(est: np.ndarray, gt: np.ndarray) -> float:
    alpha = np.sum(est * gt) / (np.sum(gt ** 2) + 1e-12)
    target = alpha * gt
    return float(10 * np.log10(np.sum(target ** 2)
                               / (np.sum((est - target) ** 2) + 1e-12)
                               + 1e-12))
