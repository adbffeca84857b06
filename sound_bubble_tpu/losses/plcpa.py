"""Power-law compressed phase-aware (PLCPA) loss.

Reference: `/root/reference/src/losses/Perceptual_Loss.py:31-193` (itself from
arXiv:2106.02896). Own conv-STFT frontend semantics (`src/losses/stft.py`):
sqrt-Hamming window of win_len, rfft basis of fft_len truncated to win_len
rows, NO normalization, stride hop, no padding.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.ops.stft import frame


@lru_cache(maxsize=4)
def _conv_stft_kernel(win_len: int, fft_len: int) -> np.ndarray:
    import scipy.signal

    window = scipy.signal.get_window("hamming", win_len, fftbins=True) ** 0.5
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]          # [win, F]
    kernel = np.concatenate([np.real(basis), np.imag(basis)], axis=1).T
    return (kernel * window).astype(np.float32)              # [2F, win]


class PLCPALoss:
    def __init__(self, window_size: int = 320, hop_size: int | None = 160,
                 fft_len: int | None = 512, power: float = 0.3,
                 eps: float = 1e-12, zero_mean: bool = True,
                 scale_asym: float = 0.0, scale_mag: float = 1.0,
                 scale_phase: float = 1.0, return_all: bool = False):
        if fft_len is None:
            fft_len = int(2 ** np.ceil(np.log2(window_size)))
        self.win = window_size
        self.hop = window_size // 2 if hop_size is None else hop_size
        self.fdim = fft_len // 2 + 1
        self.kernel = jnp.asarray(_conv_stft_kernel(window_size, fft_len))
        self.power, self.eps, self.zero_mean = power, eps, zero_mean
        self.scale_asym, self.scale_mag = scale_asym, scale_mag
        self.scale_phase, self.return_all = scale_phase, return_all

    def _stft(self, x):
        fr = frame(x.reshape(-1, x.shape[-1]), self.win, self.hop)
        return fr @ self.kernel.T                            # [N, T, 2F]

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray):
        if self.zero_mean:
            est = est - est.mean(axis=-1, keepdims=True)
            gt = gt - gt.mean(axis=-1, keepdims=True)
        se, sg = self._stft(est), self._stft(gt)

        def amp(s):
            return jnp.sqrt(s[..., :self.fdim] ** 2
                            + s[..., self.fdim:] ** 2 + self.eps)

        ae, ag = amp(se), amp(sg)
        ce, cg = ae ** self.power, ag ** self.power
        mag_loss = jnp.mean((ce - cg) ** 2)
        spec_e = se * jnp.tile(ce / ae, (1, 1, 2))
        spec_g = sg * jnp.tile(cg / ag, (1, 1, 2))
        phase_loss = jnp.mean((spec_e - spec_g) ** 2)
        loss = self.scale_mag * mag_loss + self.scale_phase * phase_loss
        asym = 0.0
        if self.scale_asym > 0:
            delta = cg - ce
            asym = jnp.mean(jnp.square(jnp.maximum(delta, 0.0)))
            total = loss + self.scale_asym * asym
        else:
            total = loss
        if self.return_all:
            return total, loss, asym
        return total
