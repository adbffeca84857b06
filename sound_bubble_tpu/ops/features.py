"""Multichannel spatial features: ILD and IPD(sin, cos) against mic 0.

Pure real/imag math (no complex dtype — TPU/VPU friendly), mirroring the
reference's `MC_features_OMNX` / `MC_features_direct` / `IPD_OMNX`
(`/root/reference/src/models/tfgridnet_realtime_clean_dis_embd3/tfgridnet_causal.py:32-207`).

Layout here: real/imag are [B, M, T, F]; output features are [B, T, F, Cfeat]
(channels minor), with channel order identical to the reference:
  omni:        [ILD_1..ILD_{M-1}, sin_1, cos_1, ..., sin_{M-1}, cos_{M-1}]
  directional: [ILD_{2vs3}, ILD_1, ILD_4, ILD_5, sin_1, cos_1, ..., sin_5, cos_5]
giving 3(M-1) channels (omni) or 3(M-1)-1 (directional, 6-mic only).
"""
from __future__ import annotations

import jax.numpy as jnp


def _ipd_pairs(real, imag, norm, eps):
    """sin/cos of phase difference of mics 1..M-1 vs mic 0, interleaved.

    real/imag/norm: [B, M, T, F]. Returns [B, T, F, 2(M-1)] ordered
    [sin_1, cos_1, sin_2, cos_2, ...] (reference `IPD_OMNX` reshape order).
    """
    r0, i0, n0 = real[:, :1], imag[:, :1], norm[:, :1]
    r, i, n = real[:, 1:], imag[:, 1:], norm[:, 1:]
    denom = n * n0 + eps
    cos = (r * r0 + i * i0) / denom  # [B, M-1, T, F]
    sin = (r0 * i - i0 * r) / denom
    pairs = jnp.stack([sin, cos], axis=2)  # [B, M-1, 2, T, F]
    b, m1, _, t, f = pairs.shape
    return jnp.moveaxis(pairs.reshape(b, 2 * m1, t, f), 1, -1)  # [B,T,F,2(M-1)]


def spatial_features(real: jnp.ndarray, imag: jnp.ndarray,
                     directional: bool = False, eps: float = 1e-6):
    """ILD + IPD features. real/imag: [B, M, T, F] -> [B, T, F, Cfeat]."""
    norm = jnp.sqrt(jnp.square(real) + jnp.square(imag))
    if directional:
        # reference `MC_features_direct`: one extra-baseline ILD (mic2 vs mic3)
        # plus ILDs of mics [1, 4, 5] vs mic 0; IPDs over all mics 1..5.
        ild_d = jnp.log10((norm[:, 2:3] + eps) / (norm[:, 3:4] + eps))
        ild_m = jnp.log10((norm[:, (1, 4, 5), :, :] + eps) / (norm[:, 0:1] + eps))
        ild = jnp.concatenate([ild_d, ild_m], axis=1)
    else:
        ild = jnp.log10((norm[:, 1:] + eps) / (norm[:, 0:1] + eps))
    ild = jnp.moveaxis(ild, 1, -1)  # [B, T, F, n_ild]
    ipd = _ipd_pairs(real, imag, norm, eps)
    return jnp.concatenate([ild, ipd], axis=-1)
