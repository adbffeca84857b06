"""Formant-filtered glottal-pulse voice model (jit-able, batched).

Round 2 trained on 5-harmonic quasi-speech (`datagen.campaign.speechlike_voices`)
and STOI — which keys on 1/3-octave *envelope* structure of real speech —
degraded through the model. This source model closes that gap with the
classic Klatt-style parallel-formant synthesis chain, built entirely from
XLA-friendly ops (cumsum, rfft/irfft, interp — no data-dependent control
flow), so it runs inside the jitted campaign train step:

1. a syllable track (~5 syll/s slots; voiced / unvoiced / plosive-onset /
   pause types) with per-syllable F0, formant (F1-F3) and amplitude targets,
   linearly interpolated between syllable centers (articulator-like
   trajectories) and smoothed at ~35 ms (raised-cosine onsets/offsets);
2. PER-SPEAKER parameter draws (round 4): vocal-tract-length factor scaling
   all formant targets (correlated with the speaker's F0 base, as in real
   talkers), F0 excursion range, speaking rate, and breathiness — so a batch
   spans talker variability, not just utterance variability;
3. excitation: a glottal impulse train from the running phase of the
   jittered F0 contour (period jitter + slow declination), aspiration
   noise when voiced, full noise when unvoiced, and PLOSIVE BURSTS
   (round 4): ~16% of voiced syllables begin with a 10-15 ms decaying
   broadband transient at the syllable onset — the stop-consonant energy
   jumps real speech has and pure formant synthesis lacks;
4. time-varying spectral envelope applied frame-wise (20 ms sqrt-Hann STFT,
   75% overlap): sum of three Lorentzian formant resonances with a -6 dB/oct
   glottal tilt when voiced, blended with a PER-SYLLABLE fricative resonance
   (round 4: each unvoiced syllable draws its own 2.5-7 kHz center, so /s/-
   vs /sh/-like spectra alternate) when unvoiced;
5. random leading silence (reference `load_voice_clip`'s zero_front,
   `/root/reference/src/generate_adaptive_dataset.py` U(4000,64000)@48 kHz),
   noise floor, peak normalization.

The result has realistic modulation spectra (3-6 Hz syllabic energy, pitch
declination, voiced/unvoiced alternation) — the properties STOI and the
separation model actually key on.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from sound_bubble_tpu.ops.stft import frame, overlap_add


def _smooth(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Hann-kernel smoothing of a 1-D track (edge-padded)."""
    w = np.hanning(k + 2)[1:-1]
    w = (w / w.sum()).astype(np.float32)
    xp = jnp.pad(x, (k // 2, k - 1 - k // 2), mode="edge")
    return sum(float(w[i]) * xp[i:i + x.shape[0]] for i in range(k))


def _one_voice(key, n: int, sr: int, hop: int, win: int, S: int,
               pause_p, sil_hi, f0_base_in):
    """One voice. The last three args are per-voice TRACED scalars
    (round-5 overlap curriculum, VERDICT r4 #2):

    pause_p     pause-syllable probability (0.20 = the default talker;
                ~0.05 makes a DENSE talker with near-continuous speech —
                the unvoiced/plosive rates stay fixed, pause mass converts
                to voiced syllables);
    sil_hi      leading-silence upper bound in SAMPLES;
    f0_base_in  talker F0 base in Hz, or <=0 to draw the default U(95,240).
    """
    ks = jax.random.split(key, 18)
    f32 = jnp.float32

    # --- per-speaker draws (one per clip: talker identity) ---
    f0_base = jnp.where(
        f0_base_in > 0.0, f0_base_in,
        jax.random.uniform(ks[2], (), minval=95.0, maxval=240.0))
    # vocal tract length tracks F0 (taller talkers: lower F0, lower formants);
    # ~+-2 semitone independent spread on top of the correlation
    vtl = (f0_base / 150.0) ** 0.25 * 2.0 ** jax.random.uniform(
        ks[12], (), minval=-0.12, maxval=0.12)
    f0_range = jax.random.uniform(ks[13], (), minval=0.5, maxval=1.5)
    rate = jax.random.uniform(ks[14], (), minval=0.8, maxval=1.3)
    breath = jax.random.uniform(ks[15], (), minval=0.02, maxval=0.09)

    # --- syllable plan ---
    dur = jax.random.uniform(ks[0], (S,), minval=0.08, maxval=0.25) * rate
    bounds = jnp.cumsum(dur)
    centers = bounds - dur / 2
    u = jax.random.uniform(ks[1], (S,))
    is_pause = u < pause_p
    is_unv = (u >= pause_p) & (u < pause_p + 0.16)
    is_plos = (u >= pause_p + 0.16) & (u < pause_p + 0.32)  # stop-onset voiced
    voiced_s = ((~is_pause) & (~is_unv)).astype(f32)

    f0_s = f0_base * 2.0 ** (f0_range * jax.random.uniform(
        ks[3], (S,), minval=-0.3, maxval=0.2))
    # pitch declination over the utterance (~ -2.5 semitones end to end)
    f0_s = f0_s * 2.0 ** (-0.2 * centers / (bounds[-1] + 1e-6))
    F1_s = vtl * jax.random.uniform(ks[4], (S,), minval=300.0, maxval=850.0)
    F2_s = vtl * jax.random.uniform(ks[5], (S,), minval=950.0, maxval=2400.0)
    F3_s = vtl * jax.random.uniform(ks[6], (S,), minval=2350.0, maxval=3100.0)
    # per-unvoiced-syllable fricative center (log-uniform 2.5-7 kHz: /sh/../s/)
    fric_s = 2500.0 * 2.0 ** jax.random.uniform(ks[16], (S,), maxval=1.5)
    amp_s = jax.random.uniform(ks[7], (S,), minval=0.55, maxval=1.0) \
        * (1.0 - is_pause.astype(f32))

    # --- frame tracks (hop-rate) ---
    nf = n // hop + 5
    ft = (jnp.arange(nf, dtype=f32) + 0.5) * hop / sr
    f0_f = jnp.interp(ft, centers, f0_s)
    F1_f = jnp.interp(ft, centers, F1_s)
    F2_f = jnp.interp(ft, centers, F2_s)
    F3_f = jnp.interp(ft, centers, F3_s)
    idx = jnp.clip(jnp.searchsorted(bounds, ft), 0, S - 1)
    amp_f = _smooth(amp_s[idx], 9)          # ~45 ms raised-cosine on/offsets
    voiced_f = _smooth(voiced_s[idx], 9)
    fric_f = _smooth(fric_s[idx], 5)        # per-syllable fricative center

    # plosive bursts: decaying broadband transient at stop-syllable onsets
    # (frame-rate envelope — 5 ms resolution is enough for a 12 ms decay)
    onset_t = bounds - dur                             # [S] syllable starts
    dt = ft[None, :] - onset_t[:, None]                # [S, nf]
    gain_s = is_plos.astype(f32) * (0.35 + 0.65 * amp_s)
    burst_f = jnp.sum(gain_s[:, None] * jnp.exp(-dt / 0.012)
                      * (dt >= 0.0), axis=0)

    # --- sample-rate excitation ---
    st = jnp.arange(n, dtype=f32) / sr
    f0_n = jnp.interp(st, ft, f0_f)
    jitter = _smooth(jax.random.normal(ks[8], (nf,)), 15)
    f0_n = f0_n * (1.0 + 0.03 * jnp.interp(st, ft, jitter))
    amp_n = jnp.interp(st, ft, amp_f)
    voiced_n = jnp.interp(st, ft, voiced_f)
    phase = jnp.cumsum(f0_n) / sr
    fr = phase - jnp.floor(phase)
    # unit-power impulse train: amplitude sqrt(sr/f0) (one pulse per period)
    pulse = (jnp.diff(fr, prepend=jnp.zeros((1,), f32)) < 0).astype(f32) \
        * jnp.sqrt(sr / jnp.maximum(f0_n, 1.0))
    noise = jax.random.normal(ks[9], (n,))
    burst_n = jnp.interp(st, ft, burst_f)
    exc = pulse * voiced_n * amp_n \
        + noise * amp_n * (0.35 * (1.0 - voiced_n) + breath * voiced_n) \
        + jax.random.normal(ks[17], (n,)) * burst_n * 0.8

    # --- frame-wise formant filtering (sqrt-Hann analysis+synthesis OLA) ---
    w = jnp.asarray(np.hanning(win + 1)[:-1].astype(np.float32) ** 0.5)
    tot = (nf - 1) * hop + win
    frames = frame(jnp.pad(exc, (0, tot - n)), win, hop) * w  # [nf, win]
    spec = jnp.fft.rfft(frames)
    freqs = jnp.asarray((np.fft.rfftfreq(win) * sr).astype(np.float32))

    def reso(fc, bw):
        return (bw * bw) / (jnp.square(freqs[None] - fc[:, None]) + bw * bw)

    # glottal + radiation tilt: ~ -11 dB/oct above 700 Hz (long-term speech
    # spectrum falls ~ -12 dB/oct above 500 Hz)
    tilt = (1.0 + jnp.square(freqs / 700.0)) ** -0.9
    Hv = (1.0 * reso(F1_f, 80.0) + 0.5 * reso(F2_f, 120.0)
          + 0.3 * reso(F3_f, 180.0) + 0.005) * tilt[None]
    # per-syllable fricative resonance (center fric_f in 2.5-7 kHz, broad
    # skirt) with a high-pass character below the center — /s/ vs /sh/
    # spectra alternate across unvoiced syllables
    fbw = 0.35 * fric_f
    hp = jnp.square(freqs[None] / fric_f[:, None]) \
        / (1.0 + jnp.square(freqs[None] / fric_f[:, None]))
    roll = 1.0 / (1.0 + jnp.square(freqs / 8000.0))[None]   # knee past 8 kHz
    Huv = 0.28 * hp * roll * (fbw[:, None] ** 2 / (
        jnp.square(freqs[None] - fric_f[:, None]) + fbw[:, None] ** 2)
        + 0.30 * hp) + 0.004
    H = voiced_f[:, None] * Hv + (1.0 - voiced_f[:, None]) * Huv
    y = overlap_add(jnp.fft.irfft(spec * H, n=win) * w, hop)[:n] / 1.5

    # --- leading silence + floor + peak norm ---
    lo = int(0.083 * sr)
    hi = jnp.maximum(sil_hi.astype(jnp.int32), lo + 1)
    zs = jax.random.randint(ks[10], (), jnp.minimum(lo, hi - 1), hi)
    y = jnp.where(jnp.arange(n) < zs, 0.0, y)
    y = y + 0.0007 * jax.random.normal(ks[11], (n,))
    return y / (jnp.max(jnp.abs(y)) + 1e-9)


@functools.partial(jax.jit, static_argnames=("batch_shape", "n", "sr"))
def formant_voices(key, batch_shape, n: int, sr: int,
                   pause_p=None, sil_hi=None, f0_base=None) -> jnp.ndarray:
    """Batched formant voices: [*batch_shape, n] float32.

    Optional per-voice overrides, each [*batch_shape] (round-5 overlap
    curriculum): `pause_p` pause probability (default 0.20), `sil_hi`
    leading-silence cap in samples (default min(1.33 s, 0.4*n)),
    `f0_base` talker F0 in Hz (<=0 or None: draw the default U(95,240))."""
    bs = tuple(batch_shape)
    m = int(np.prod(bs)) if bs else 1
    keys = jax.random.split(key, m)
    hop = max(sr // 200, 1)          # 5 ms
    win = 4 * hop                    # 20 ms, 75% overlap
    S = int(n / sr * 5) + 2          # syllable slots
    default_hi = float(max(int(min(1.33 * sr, 0.4 * n)), int(0.083 * sr) + 1))
    pp = (jnp.full((m,), 0.20, jnp.float32) if pause_p is None
          else jnp.asarray(pause_p, jnp.float32).reshape(m))
    sh = (jnp.full((m,), default_hi, jnp.float32) if sil_hi is None
          else jnp.asarray(sil_hi, jnp.float32).reshape(m))
    fb = (jnp.full((m,), -1.0, jnp.float32) if f0_base is None
          else jnp.asarray(f0_base, jnp.float32).reshape(m))
    out = jax.vmap(
        lambda k, p, s, f: _one_voice(k, n, sr, hop, win, S, p, s, f)
    )(keys, pp, sh, fb)
    return out.reshape(bs + (n,))


def formant_speechlike(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    """numpy-facing single-clip wrapper (host eval-set generators): same
    synthesis, run on the CPU backend so it never contends with a TPU
    campaign."""
    seed = int(rng.integers(0, 2 ** 31 - 1))
    with jax.default_device(jax.devices("cpu")[0]):
        y = formant_voices(jax.random.PRNGKey(seed), (1,), n, sr)
        return np.asarray(y[0], dtype=np.float64)
