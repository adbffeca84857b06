"""On-device (jit/TPU) batched mixing + augmentation pipeline.

The reference renders training data offline on CPU (pyroomacoustics) and
augments per-sample in DataLoader workers. The TPU-native path keeps training
fed without host stalls: geometry/RIRs are pre-sampled (offline or via
`ism.compute_rirs_jax` on the MXU), and everything sample-rate-speed —
RIR convolution, per-source peak scaling, SNR-exact mixing, channel-gain /
shift / colored-noise augmentation — runs batched under jit.

All functions are shape-static and PRNG-key driven (usable inside a pjit
train step or an async device-prefetch pipeline).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sound_bubble_tpu.ops.fft_conv import fft_conv
from sound_bubble_tpu.ops.noise import powerlaw_psd_gaussian_jax


def render_sources(voices: jnp.ndarray, rirs: jnp.ndarray) -> jnp.ndarray:
    """Batched RIR convolution. voices [B, S, T], rirs [B, S, M, L] ->
    premix [B, S, M, T] (truncated to T)."""
    out = fft_conv(voices[:, :, None, :], rirs, mode="full")
    return out[..., :voices.shape[-1]]


def peak_scale(key, premix: jnp.ndarray, lo: float = 0.5, hi: float = 0.9):
    """Per-source random peak normalization (reference `:476-487`)."""
    b, s = premix.shape[:2]
    scale = jax.random.uniform(key, (b, s, 1, 1), minval=lo, maxval=hi)
    peak = jnp.max(jnp.abs(premix), axis=(-2, -1), keepdims=True)
    return premix / (peak + 1e-9) * scale


def mix_to_target_snr(near: jnp.ndarray, far: jnp.ndarray,
                      target_snr: jnp.ndarray, eps: float = 1e-9):
    """Batched exact SNR scaling (the reference quadratic,
    `generate_realdata_from_denoised.py:41-133`, with near == near_hat).

    near/far: [B, M, T] summed near/far signals; target_snr: [B].
    Returns (far_scale [B], mixture [B, M, T])."""
    ref_near = near[:, 0]
    ref_far = far[:, 0]
    near_pwr = jnp.sum(ref_near ** 2, -1)
    far_pwr = jnp.sum(ref_far ** 2, -1)
    target_noise_pwr = near_pwr / (10 ** (target_snr / 10))
    # near_error == 0 here (clean targets) -> k = sqrt(noise_pwr / far_pwr)
    k = jnp.sqrt(target_noise_pwr / (far_pwr + eps))
    mixture = near + k[:, None, None] * far
    return k, mixture


def augment(key, mixture: jnp.ndarray, gt: jnp.ndarray,
            max_gain_db: float = 3.0, max_shift: int = 2,
            noise_levels=(1e-3, 5e-3, 5e-3), p_drop: float = 0.0):
    """Batched training augmentation (channel gain, circular sample shift,
    white+pink+brown noise, optional channel drop). gt follows channel 0."""
    b, m, t = mixture.shape
    kg, ks, kw, kp, kb, kl, kd = jax.random.split(key, 7)

    gains = 10 ** ((jax.random.uniform(kg, (b, m, 1)) * 2 - 1)
                   * max_gain_db / 20)
    mixture = mixture * gains
    gt = gt * gains[:, 0:1]

    shifts = jax.random.randint(ks, (b, m), -max_shift, max_shift + 1)
    idx = (jnp.arange(t)[None, None, :] - shifts[..., None]) % t
    mixture = jnp.take_along_axis(mixture, idx, axis=-1)
    gt_idx = (jnp.arange(t)[None, None, :] - shifts[:, 0:1, None]) % t
    gt = jnp.take_along_axis(gt, gt_idx, axis=-1)

    wl, pl, bl = noise_levels
    lv = jax.random.uniform(kl, (3, b, 1, 1))
    noise = (wl * lv[0]) * jax.random.normal(kw, (b, m, t))
    noise += (pl * lv[1]) * powerlaw_psd_gaussian_jax(kp, 1, (b, m, t))
    noise += (bl * lv[2]) * powerlaw_psd_gaussian_jax(kb, 2, (b, m, t))
    mixture = mixture + noise

    if p_drop > 0:
        drop = (jax.random.uniform(kd, (b, m, 1)) < p_drop)
        drop = drop.at[:, 0].set(False)  # never drop the reference channel
        mixture = jnp.where(drop, 0.0, mixture)
    return mixture, gt


def make_training_batch(key, voices, rirs, n_near, target_snr,
                        augment_kwargs=None):
    """Full on-device batch assembly.

    voices: [B, S, T] dry sources (first `n_near` are in-bubble),
    rirs: [B, S, M, L], n_near: static int, target_snr: [B].
    Returns (inputs {'mixture'}, targets {'target'}), all on device."""
    k1, k2, k3 = jax.random.split(key, 3)
    premix = render_sources(voices, rirs)
    premix = peak_scale(k1, premix)
    near = jnp.sum(premix[:, :n_near], axis=1)   # [B, M, T]
    far = jnp.sum(premix[:, n_near:], axis=1)
    _, mixture = mix_to_target_snr(near, far, target_snr)
    gt = near[:, 0:1]
    mixture, gt = augment(k2, mixture, gt, **(augment_kwargs or {}))
    # renormalize if clipped (reference `:735-741`)
    peak = jnp.max(jnp.abs(mixture), axis=(-2, -1), keepdims=True)
    div = jnp.maximum(peak, 1.0)
    return {"mixture": mixture / div}, {"target": gt / div[:, 0:1]}
