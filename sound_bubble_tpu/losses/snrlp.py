"""SNRLP pretrain loss: SNR on positive samples, weighted L1-to-zero on
"negative" (empty-bubble) samples — branchless for XLA.

Reference semantics (`/root/reference/src/losses/SNRLP.py:9-42`): the negative
branch is `nn.L1Loss()` (a SINGLE scalar = mean |est| over the whole negative
subset) assigned to every negative sample, times `neg_weight`; positives get
the per-sample neg-SDR. Data-dependent boolean indexing is replaced by masked
means (identical values, jit-compatible).
"""
from __future__ import annotations

import jax.numpy as jnp

from sound_bubble_tpu.losses.sdr import SNRLosses


class SNRLPLoss:
    def __init__(self, snr_loss_name: str = "snr", neg_weight: float = 1.0):
        self.snr_loss = SNRLosses(snr_loss_name)
        self.neg_weight = neg_weight

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        """est/gt: [B, C, T] -> [B] per-sample loss."""
        b, c, t = est.shape
        neg_mask = jnp.max(jnp.abs(gt), axis=(1, 2)) == 0  # [B]
        # scalar mean-|est| over the negative subset (0 if none — then unused)
        per_sample_l1 = jnp.mean(jnp.abs(est), axis=(1, 2))
        n_neg = jnp.sum(neg_mask)
        neg_scalar = jnp.sum(per_sample_l1 * neg_mask) / jnp.maximum(n_neg, 1)
        pos = self.snr_loss(est, gt).reshape(b, c).mean(axis=1)
        return jnp.where(neg_mask, neg_scalar * self.neg_weight, pos)
