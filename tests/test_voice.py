"""Formant voice model (datagen.voice): statistics that make it 'speech-like'.

The round-3 campaign trains on these sources specifically to fix the STOI
regression (VERDICT r2 weak #2): the properties tested here — spectral
centroid, syllabic 2-8 Hz modulation, crest factor, activity — are the ones
STOI keys on.
"""
import numpy as np
import pytest

import jax

from sound_bubble_tpu.datagen.voice import formant_speechlike, formant_voices


SR = 24000
N = 48000


@pytest.fixture(scope="module")
def batch():
    return np.asarray(formant_voices(jax.random.PRNGKey(3), (6,), N, SR))


def test_shape_norm_finite(batch):
    assert batch.shape == (6, N)
    assert np.all(np.isfinite(batch))
    peaks = np.abs(batch).max(axis=1)
    assert np.allclose(peaks, 1.0, atol=1e-3)


def test_deterministic():
    a = formant_voices(jax.random.PRNGKey(5), (2,), 24000, SR)
    b = formant_voices(jax.random.PRNGKey(5), (2,), 24000, SR)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    c = formant_voices(jax.random.PRNGKey(6), (2,), 24000, SR)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_spectral_centroid_speechlike(batch):
    """Long-term power centroid of real speech sits ~0.4-1.2 kHz."""
    fr = np.fft.rfftfreq(N, 1 / SR)
    for y in batch:
        S = np.abs(np.fft.rfft(y)) ** 2
        cent = (S * fr).sum() / S.sum()
        assert 300 < cent < 1500, cent


def test_syllabic_modulation(batch):
    """Energy-envelope modulation concentrated at syllable rates (2-8 Hz)."""
    env = np.abs(batch).reshape(len(batch), -1, SR // 100).mean(2)  # 100 Hz
    E = np.abs(np.fft.rfft(env - env.mean(1, keepdims=True), axis=1))
    f = np.fft.rfftfreq(env.shape[1], 1 / 100)
    frac = E[:, (f >= 2) & (f <= 8)].sum() / E.sum()
    assert frac > 0.2, frac


def test_activity_and_crest(batch):
    env = np.abs(batch).reshape(len(batch), -1, SR // 100).mean(2)
    act = (env > 0.1 * env.max(1, keepdims=True)).mean()
    assert 0.3 < act < 0.95, act         # pauses exist, but speech dominates
    crest = 1.0 / np.sqrt((batch ** 2).mean(1))
    assert np.all(crest > 3) and np.all(crest < 30)   # ~10-30 dB


def test_leading_silence(batch):
    lead = int(0.08 * SR)
    assert np.abs(batch[:, :lead]).max() < 0.02


def test_per_speaker_spectral_diversity(batch):
    """Round-4 per-speaker draws (vocal-tract length, F0 range, rate,
    breathiness) should spread the long-term spectral centroid across clips —
    talker variability, not just utterance variability."""
    fr = np.fft.rfftfreq(N, 1 / SR)
    cents = []
    for y in batch:
        S = np.abs(np.fft.rfft(y)) ** 2
        cents.append((S * fr).sum() / S.sum())
    assert np.std(cents) > 80, cents


def test_plosive_transients(batch):
    """Round-4 stop bursts: clips should contain abrupt high-band (>2 kHz)
    energy onsets — a >6x jump in 2-8 kHz band energy within 10 ms, which
    smooth formant trajectories alone never produce."""
    from scipy.signal import butter, sosfilt
    sos = butter(4, [2000, 8000], "bandpass", fs=SR, output="sos")
    n_onsets = 0
    for y in batch:
        hb = sosfilt(sos, y)
        env = (hb ** 2).reshape(-1, SR // 100).mean(1)     # 10 ms frames
        prev = np.maximum(env[:-1], 1e-8 * env.max())
        n_onsets += int(((env[1:] / prev > 6.0)
                         & (env[1:] > 0.05 * env.max())).sum())
    assert n_onsets >= len(batch), n_onsets   # >=1 burst per clip on average


def test_numpy_wrapper_matches_api(rng):
    y = formant_speechlike(rng, 12000, SR)
    assert y.shape == (12000,)
    assert y.dtype == np.float64
    assert np.abs(y).max() <= 1.0 + 1e-6
