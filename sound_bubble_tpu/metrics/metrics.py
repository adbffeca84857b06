"""Evaluation metrics with torchmetrics conventions.

Pinned to the reference's metric layer
(`/root/reference/src/metrics/metrics.py:38-97`):
- snr: zero_mean=False; si_sdr: zero_mean=False; si_snr == si_sdr with
  zero-mean (torchmetrics functional defaults);
- `*_i` variants are improvement over the mixture: metric(est) - metric(mix);
- STOI via our own implementation (metrics/stoi.py); PESQ is gated on the
  optional `pesq` package (not in this image) and returns NaN otherwise;
- `compute_decay` = 10log10(P_mix) - 10log10(P_est), the empty-bubble
  suppression measure (`metrics.py:20-36`).

All core metrics are pure jnp (usable inside jit); the Metrics wrapper also
accepts numpy and averages over channels like the reference.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_EPS = float(np.finfo(np.float32).eps)


def snr(preds, target, zero_mean: bool = False):
    """[..., T] -> [...] in dB."""
    if zero_mean:
        preds = preds - jnp.mean(preds, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    noise = target - preds
    val = (jnp.sum(target ** 2, axis=-1) + _EPS) / \
          (jnp.sum(noise ** 2, axis=-1) + _EPS)
    return 10.0 * jnp.log10(val)


def si_sdr(preds, target, zero_mean: bool = False):
    """Scale-invariant SDR, torchmetrics convention. [..., T] -> [...]."""
    if zero_mean:
        preds = preds - jnp.mean(preds, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    alpha = (jnp.sum(preds * target, axis=-1, keepdims=True) + _EPS) / \
            (jnp.sum(target ** 2, axis=-1, keepdims=True) + _EPS)
    scaled = alpha * target
    noise = scaled - preds
    val = (jnp.sum(scaled ** 2, axis=-1) + _EPS) / \
          (jnp.sum(noise ** 2, axis=-1) + _EPS)
    return 10.0 * jnp.log10(val)


def si_snr(preds, target):
    return si_sdr(preds, target, zero_mean=True)


def compute_decay(est, mix):
    """[*, C, T] -> [*]: how strongly the model mutes an empty bubble."""
    est, mix = jnp.asarray(est), jnp.asarray(mix)
    p_est = 10.0 * jnp.log10(jnp.sum(est ** 2, axis=-1))
    p_mix = 10.0 * jnp.log10(jnp.sum(mix ** 2, axis=-1))
    return (p_mix - p_est).mean(axis=-1)


def _pesq_impl(est, gt, fs):
    """P.862 narrowband at 16 kHz like the reference (`metrics.py:58-60`).
    Uses the ITU C library when installed; otherwise our own P.862
    implementation (sound_bubble_tpu.metrics.pesq — see its docstring for
    documented deviations)."""
    from sound_bubble_tpu.data.resample import resample_poly_np
    try:
        from pesq import pesq as _pesq  # optional, not in this image

        def one(g16, e16):
            return _pesq(16000, g16, e16, "nb")
    except ImportError:
        from sound_bubble_tpu.metrics.pesq import pesq_nb

        def one(g16, e16):
            return pesq_nb(g16, e16, fs=16000)
    out = np.empty(est.shape[:-1])
    flat_e = np.asarray(est).reshape(-1, est.shape[-1])
    flat_g = np.asarray(gt).reshape(-1, gt.shape[-1])
    for i, (e, g) in enumerate(zip(flat_e, flat_g)):
        e16 = resample_poly_np(e, 16000, fs)
        g16 = resample_poly_np(g, 16000, fs)
        out.flat[i] = one(g16, e16)
    return out


class Metrics:
    """Name-dispatched metric: __call__(est, gt, mix) with [*, C, T] inputs,
    returns channel-averaged [*] values (reference `Metrics`)."""

    def __init__(self, name: str, fs: int = 24000, **kwargs):
        self.name = name
        self.fs = fs
        self.kwargs = kwargs
        if name not in ("snr", "snr_i", "si_snr", "si_snr_i", "si_sdr",
                        "si_sdr_i", "STOI", "PESQ", "Multi_Reso_L1",
                        "PLCPALoss", "Hubert", "WavLM"):
            raise NotImplementedError(f"Metric {name} not implemented!")

    def __call__(self, est, gt, mix):
        est, gt, mix = jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mix)
        n = self.name
        if n == "snr":
            v = snr(est, gt)
        elif n == "snr_i":
            v = snr(est, gt) - snr(mix, gt)
        elif n == "si_snr":
            v = si_snr(est, gt)
        elif n == "si_snr_i":
            v = si_snr(est, gt) - si_snr(mix, gt)
        elif n == "si_sdr":
            v = si_sdr(est, gt)
        elif n == "si_sdr_i":
            v = si_sdr(est, gt) - si_sdr(mix, gt)
        elif n == "STOI":
            from sound_bubble_tpu.metrics.stoi import stoi_batch
            v = jnp.asarray(stoi_batch(np.asarray(est), np.asarray(gt), self.fs))
        elif n == "PESQ":
            v = jnp.asarray(_pesq_impl(np.asarray(est), np.asarray(gt), self.fs))
        elif n == "Multi_Reso_L1":
            from sound_bubble_tpu.losses.multires_stft import MultiResoFuseLoss
            return MultiResoFuseLoss(**self.kwargs)(est, gt)
        elif n == "PLCPALoss":
            from sound_bubble_tpu.losses.plcpa import PLCPALoss
            return PLCPALoss(**self.kwargs)(est, gt)
        elif n == "Hubert":
            from sound_bubble_tpu.losses.ssl_feature import HubertLoss
            return HubertLoss(**self.kwargs)(est, gt)
        elif n == "WavLM":
            from sound_bubble_tpu.losses.ssl_feature import WavLM_Loss
            return WavLM_Loss(**self.kwargs)(est, gt)
        return v.mean(axis=-1)
