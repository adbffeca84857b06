"""Multi-resolution STFT loss with auraloss semantics (+ A-weighting).

Re-derivation of `auraloss.freq.MultiResolutionSTFTLoss` as used by the
reference finetune stage (`/root/reference/src/losses/MultiResoLoss.py:6-31`,
config `syn_experiments/finetune_stage.json:34-42`: w_sc=0, w_log_mag=0,
w_lin_mag=20, perceptual_weighting=true, sample_rate=24000, + l1_ratio*L1):

- per resolution (fft, hop, win) in ([1024,120,600],[2048,240,1200],[512,50,240]):
  torch.stft conventions — reflect center-pad by fft//2, Hann window of
  win_length zero-padded centered to fft, magnitude sqrt(clamp(.,1e-8));
- spectral convergence ||Y-X||_F/||Y||_F, log-mag L1, lin-mag L1; mean over
  resolutions;
- perceptual weighting: 101-tap A-weighting FIR (IEC 61672 analog prototype ->
  bilinear -> least-squares FIR fit, auraloss `FIRFilter("aw")`) applied to
  est and target first.

The STFT here is computed with jnp rfft on framed windows (MXU/XLA-friendly,
static shapes).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.ops.stft import frame


@lru_cache(maxsize=8)
def a_weighting_fir(fs: int, ntaps: int = 101) -> np.ndarray:
    """Least-squares FIR fit of the IEC 61672 A-weighting response."""
    import scipy.signal

    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    a1000 = 1.9997
    num = [(2 * np.pi * f4) ** 2 * (10 ** (a1000 / 20)), 0, 0, 0, 0]
    den = np.polymul([1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
                     [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2])
    den = np.polymul(np.polymul(den, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = scipy.signal.bilinear(num, den, fs=fs)
    w, h = scipy.signal.freqz(b, a, worN=512, fs=fs)
    taps = scipy.signal.firls(ntaps, w, abs(h), fs=fs)
    return taps.astype(np.float32)


def fir_filter(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """conv1d(x, taps, padding=ntaps//2) — torch cross-correlation semantics.

    x: [..., T]. Output has length T (+1 if ntaps even, matching torch)."""
    ntaps = taps.shape[0]
    pad = ntaps // 2
    lead = x.shape[:-1]
    xp = jnp.pad(x.reshape(-1, x.shape[-1]), ((0, 0), (pad, pad)))
    fr = frame(xp, ntaps, 1)                      # [N, T', ntaps]
    y = fr @ taps                                  # correlation (no flip)
    return y.reshape(lead + (y.shape[-1],))


def stft_mag(x: jnp.ndarray, fft: int, hop: int, win: int,
             eps: float = 1e-8) -> jnp.ndarray:
    """torch.stft(center=True, pad_mode='reflect') magnitude. [..., T] ->
    [..., F, frames] with F = fft//2+1."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    xf = jnp.pad(xf, ((0, 0), (fft // 2, fft // 2)), mode="reflect")
    fr = frame(xf, fft, hop)                       # [N, T', fft]
    w = jnp.zeros((fft,), x.dtype)
    lpad = (fft - win) // 2
    hann = 0.5 * (1 - jnp.cos(2 * jnp.pi * jnp.arange(win) / win))  # periodic
    w = w.at[lpad:lpad + win].set(hann.astype(x.dtype))
    spec = jnp.fft.rfft(fr * w, axis=-1)
    mag = jnp.sqrt(jnp.clip(jnp.abs(spec) ** 2, eps, None))
    return jnp.moveaxis(mag, -1, -2).reshape(lead + (fft // 2 + 1, fr.shape[-2]))


class STFTLoss:
    def __init__(self, fft_size=1024, hop_size=256, win_length=1024,
                 w_sc=1.0, w_log_mag=1.0, w_lin_mag=0.0,
                 sample_rate=None, perceptual_weighting=False, eps=1e-8):
        self.fft_size, self.hop_size, self.win_length = fft_size, hop_size, win_length
        self.w_sc, self.w_log_mag, self.w_lin_mag = w_sc, w_log_mag, w_lin_mag
        self.eps = eps
        self.taps = None
        if perceptual_weighting:
            assert sample_rate is not None, "perceptual weighting needs sample_rate"
            self.taps = jnp.asarray(a_weighting_fir(sample_rate))

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        """est/gt [B, C, T]. Returns per-sample [B] (mean over [B] equals the
        auraloss batch scalar, and per-sample form lets the trainer
        pad-and-mask uneven batches exactly) — EXCEPT when w_sc > 0: the
        auraloss spectral-convergence norm is global over the batch, which
        does not decompose per sample; that case keeps the scalar."""
        if self.taps is not None:
            est = fir_filter(est, self.taps)
            gt = fir_filter(gt, self.taps)
        b = est.shape[0]
        x = stft_mag(est.reshape(-1, est.shape[-1]), self.fft_size,
                     self.hop_size, self.win_length, self.eps)
        y = stft_mag(gt.reshape(-1, gt.shape[-1]), self.fft_size,
                     self.hop_size, self.win_length, self.eps)
        if self.w_sc:
            # auraloss batch-global path (scalar, exactly as the reference)
            loss = self.w_sc * jnp.linalg.norm(y - x) / jnp.linalg.norm(y)
            if self.w_log_mag:
                loss = loss + self.w_log_mag * jnp.mean(
                    jnp.abs(jnp.log(y) - jnp.log(x)))
            if self.w_lin_mag:
                loss = loss + self.w_lin_mag * jnp.mean(jnp.abs(y - x))
            return loss
        xb = x.reshape(b, -1)
        yb = y.reshape(b, -1)
        loss = jnp.zeros((b,), x.dtype)
        if self.w_log_mag:
            loss = loss + self.w_log_mag * jnp.mean(
                jnp.abs(jnp.log(yb) - jnp.log(xb)), axis=-1)
        if self.w_lin_mag:
            loss = loss + self.w_lin_mag * jnp.mean(jnp.abs(yb - xb), axis=-1)
        return loss


class MultiResolutionSTFTLoss:
    def __init__(self, fft_sizes=(1024, 2048, 512), hop_sizes=(120, 240, 50),
                 win_lengths=(600, 1200, 240), **kwargs):
        self.losses = [STFTLoss(f, h, w, **kwargs)
                       for f, h, w in zip(fft_sizes, hop_sizes, win_lengths)]

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        total = 0.0
        for fn in self.losses:
            total = total + fn(est, gt)
        return total / len(self.losses)


class MultiResoFuseLoss:
    """Reference finetune loss: MR-STFT + l1_ratio * L1
    (`MultiResoLoss.py:6-31`). est/gt: [B, C, T] -> per-sample [B] when
    w_sc == 0 (mean equals the reference scalar; enables exact uneven-batch
    pad-and-mask), scalar otherwise (see STFTLoss)."""

    def __init__(self, l1_ratio: float = 0.0, **kwargs):
        self.l1_ratio = l1_ratio
        self.loss_fn = MultiResolutionSTFTLoss(**kwargs)

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        loss = self.loss_fn(est, gt)
        if self.l1_ratio > 0:
            l1 = jnp.abs(est - gt)
            if loss.ndim == 1:  # per-sample path
                loss = loss + self.l1_ratio * jnp.mean(
                    l1.reshape(est.shape[0], -1), axis=-1)
            else:
                loss = loss + self.l1_ratio * jnp.mean(l1)
        return loss
