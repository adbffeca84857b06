"""FFT-domain convolution (long-RIR convolution; reference
`helpers/fft_conv.py`). jnp implementation usable inside jit, plus a numpy
variant for host-side datagen."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fft_conv(signal: jnp.ndarray, kernel: jnp.ndarray,
             mode: str = "full") -> jnp.ndarray:
    """Linear convolution along the last axis via rfft (broadcasting leading
    dims). mode: 'full' | 'same' | 'valid'."""
    n = signal.shape[-1] + kernel.shape[-1] - 1
    nfft = 1 << (n - 1).bit_length()
    out = jnp.fft.irfft(jnp.fft.rfft(signal, nfft) * jnp.fft.rfft(kernel, nfft),
                        nfft)[..., :n]
    if mode == "full":
        return out
    if mode == "same":
        start = (kernel.shape[-1] - 1) // 2
        return out[..., start:start + signal.shape[-1]]
    if mode == "valid":
        k = kernel.shape[-1]
        return out[..., k - 1:signal.shape[-1]]
    raise ValueError(mode)


def fft_conv_np(signal: np.ndarray, kernel: np.ndarray,
                mode: str = "full") -> np.ndarray:
    import scipy.signal

    return scipy.signal.fftconvolve(signal, kernel, mode=mode, axes=-1)
