"""Colored (1/f^beta) noise synthesis, Timmer & Koenig (1995).

Numpy equivalent of the reference's `helpers/pink_noise.py` (normalized to
unit variance; pink beta=1, brown beta=2), plus a jnp variant usable inside
jit for on-device augmentation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def powerlaw_psd_gaussian(exponent: float, size, fmin: float = 0.0,
                          rng: np.random.Generator | None = None) -> np.ndarray:
    if rng is None:
        rng = np.random.default_rng()
    size = list(size) if not isinstance(size, int) else [size]
    samples = size[-1]
    f = np.fft.rfftfreq(samples)
    if not 0 <= fmin <= 0.5:
        raise ValueError("fmin must be chosen between 0 and 0.5.")
    fmin = max(fmin, 1.0 / samples)
    s_scale = f.copy()
    ix = int(np.sum(s_scale < fmin))
    if ix and ix < len(s_scale):
        s_scale[:ix] = s_scale[ix]
    s_scale = s_scale ** (-exponent / 2.0)
    w = s_scale[1:].copy()
    w[-1] *= (1 + (samples % 2)) / 2.0
    sigma = 2 * np.sqrt(np.sum(w ** 2)) / samples
    size[-1] = len(f)
    sr = rng.normal(scale=s_scale, size=size)
    si = rng.normal(scale=s_scale, size=size)
    if not (samples % 2):
        si[..., -1] = 0
        sr[..., -1] *= np.sqrt(2)
    si[..., 0] = 0
    sr[..., 0] *= np.sqrt(2)
    y = np.fft.irfft(sr + 1j * si, n=samples, axis=-1) / sigma
    return y


def powerlaw_psd_gaussian_jax(key, exponent: float, size) -> jnp.ndarray:
    """jit-friendly colored noise for on-device augmentation."""
    samples = size[-1]
    f = np.fft.rfftfreq(samples)
    fmin = 1.0 / samples
    s_scale = f.copy()
    ix = int(np.sum(s_scale < fmin))
    if ix and ix < len(s_scale):
        s_scale[:ix] = s_scale[ix]
    s_scale = s_scale ** (-exponent / 2.0)
    w = s_scale[1:].copy()
    w[-1] *= (1 + (samples % 2)) / 2.0
    sigma = 2 * np.sqrt(np.sum(w ** 2)) / samples
    scale = jnp.asarray(s_scale, jnp.float32)
    kr, ki = jax.random.split(key)
    shape = tuple(size[:-1]) + (len(f),)
    sr = jax.random.normal(kr, shape) * scale
    si = jax.random.normal(ki, shape) * scale
    if not (samples % 2):
        si = si.at[..., -1].set(0)
        sr = sr.at[..., -1].multiply(np.sqrt(2))
    si = si.at[..., 0].set(0)
    sr = sr.at[..., 0].multiply(np.sqrt(2))
    return jnp.fft.irfft(sr + 1j * si, n=samples, axis=-1) / sigma


def colored_noise_traced(key, beta, n: int) -> jnp.ndarray:
    """Colored noise with a TRACED per-sample exponent.

    `powerlaw_psd_gaussian_jax` bakes the exponent into numpy constants;
    this variant computes the 1/f^(beta/2) spectral envelope (and its
    unit-variance normalizer) in jnp so `beta` can be drawn inside a jitted
    batch (on-device background-noise augmentation, datagen.campaign).

    key: PRNG key. beta: [...] traced exponents. n: static sample count.
    Returns [..., n] float32 with (asymptotically) unit variance per row.
    """
    f = np.fft.rfftfreq(n)
    fmin = 1.0 / n
    f_c = jnp.asarray(np.maximum(f, fmin), jnp.float32)      # [nf]
    beta = jnp.asarray(beta, jnp.float32)[..., None]
    s_scale = f_c ** (-beta / 2.0)                           # [..., nf]
    w = s_scale[..., 1:]
    if not (n % 2):
        w = w.at[..., -1].multiply(0.5)
    else:
        # odd n: last bin keeps full weight (matches the numpy reference)
        pass
    sigma = 2.0 * jnp.sqrt(jnp.sum(w ** 2, axis=-1, keepdims=True)) / n
    kr, ki = jax.random.split(key)
    shape = s_scale.shape
    sr = jax.random.normal(kr, shape) * s_scale
    si = jax.random.normal(ki, shape) * s_scale
    if not (n % 2):
        si = si.at[..., -1].set(0)
        sr = sr.at[..., -1].multiply(np.sqrt(2))
    si = si.at[..., 0].set(0)
    sr = sr.at[..., 0].multiply(np.sqrt(2))
    return jnp.fft.irfft(sr + 1j * si, n=n, axis=-1) / sigma
