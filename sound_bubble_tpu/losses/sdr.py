"""Negative-SDR loss family with asteroid `SingleSrcNegSDR` semantics.

Conventions pinned to asteroid (used by the reference losses,
`/root/reference/src/losses/SNRLosses.py:6-53`): zero-mean both signals,
EPS=1e-8 inside the energy ratio and the log. Returns per-sample values
(reduction happens in the training module).
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def neg_sdr(est: jnp.ndarray, target: jnp.ndarray, sdr_type: str = "snr",
            zero_mean: bool = True) -> jnp.ndarray:
    """-SDR over the last axis. est/target: [..., T] -> [...]."""
    assert sdr_type in ("snr", "sisdr", "sdsdr")
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(est * target, axis=-1, keepdims=True)
        energy = jnp.sum(target ** 2, axis=-1, keepdims=True) + EPS
        scaled = dot * target / energy
    else:
        scaled = target
    if sdr_type in ("snr", "sdsdr"):
        e_noise = est - target
    else:
        e_noise = est - scaled
    ratio = jnp.sum(scaled ** 2, axis=-1) / (jnp.sum(e_noise ** 2, axis=-1) + EPS)
    return -10.0 * jnp.log10(ratio + EPS)


class SNRLosses:
    """Name-dispatched combination of neg-SDR variants (reference
    `SNRLosses`): snr | sisdr | fused | max_fused | sdsdr | full.
    __call__(est, gt): [B, C, T] -> [B*C] per-sample loss."""

    def __init__(self, name: str, **_):
        if name not in ("snr", "sisdr", "fused", "max_fused", "sdsdr", "full"):
            raise AssertionError(f"Invalid loss function used: Loss {name} not found")
        self.name = name

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        b, c, t = est.shape
        est = est.reshape(b * c, t)
        gt = gt.reshape(b * c, t)
        if self.name == "fused":
            return 0.5 * neg_sdr(est, gt, "sisdr") + 0.5 * neg_sdr(est, gt, "snr")
        if self.name == "max_fused":
            return jnp.maximum(neg_sdr(est, gt, "sisdr"), neg_sdr(est, gt, "snr"))
        if self.name == "sdsdr":
            return jnp.maximum(neg_sdr(est, gt, "snr"), neg_sdr(est, gt, "sdsdr"))
        if self.name == "full":
            return 0.5 * neg_sdr(est, gt, "sisdr") + 0.5 * jnp.maximum(
                neg_sdr(est, gt, "snr"), neg_sdr(est, gt, "sdsdr"))
        return neg_sdr(est, gt, self.name)
