"""Spatial audio helpers: GCC-PHAT delay estimation and channel shifting
(reference `helpers/utils.py:43-274`)."""
from __future__ import annotations

import numpy as np

from sound_bubble_tpu.constants import SPEED_OF_SOUND


def gcc_phat(sig: np.ndarray, refsig: np.ndarray, fs: int = 1,
             max_tau: float | None = None, interp: int = 16):
    """Generalized cross-correlation with phase transform.
    Returns (tau_seconds, cross_correlation)."""
    n = sig.shape[-1] + refsig.shape[-1]
    S = np.fft.rfft(sig, n=n)
    R = np.fft.rfft(refsig, n=n)
    cross = S * np.conj(R)
    cc = np.fft.irfft(cross / (np.abs(cross) + 1e-15), n=interp * n)
    max_shift = interp * n // 2
    if max_tau is not None:
        max_shift = min(int(interp * fs * max_tau), max_shift)
    cc = np.concatenate((cc[..., -max_shift:], cc[..., :max_shift + 1]),
                        axis=-1)
    shift = np.argmax(np.abs(cc), axis=-1) - max_shift
    return shift / float(interp * fs), cc


def shift_mixture(input_data: np.ndarray, target_position, mic_positions,
                  sr: int, inverse: bool = False):
    """Align channels by integer-sample delays toward `target_position`
    relative to channel 0 (fractional variant below)."""
    n_ch = input_data.shape[0]
    dists = np.linalg.norm(np.asarray(mic_positions)
                           - np.asarray(target_position)[None, :], axis=-1)
    shifts = np.round((dists - dists[0]) / SPEED_OF_SOUND * sr).astype(int)
    out = input_data.copy()
    for ch in range(1, n_ch):
        s = -shifts[ch] if not inverse else shifts[ch]
        out[ch] = np.roll(input_data[ch], s)
    return out, shifts


def fractional_shift(x: np.ndarray, shift: float) -> np.ndarray:
    """Fractional-sample delay via frequency-domain phase ramp."""
    n = x.shape[-1]
    f = np.fft.rfftfreq(n)
    return np.fft.irfft(np.fft.rfft(x) * np.exp(-2j * np.pi * f * shift), n)
