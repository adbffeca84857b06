"""LogPowerLoss and CompositeLoss (reference `LogPowerLoss.py`,
`CompositeLoss.py`) in branchless jnp."""
from __future__ import annotations

import jax.numpy as jnp

from sound_bubble_tpu.losses.sdr import neg_sdr


class LogPowerLoss:
    """10*log10(sum est^2) per sample; only meaningful when gt == 0
    (`LogPowerLoss.py:5-23`). est: [B, C, T] -> [B]."""

    def __init__(self, **_):
        pass

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        loss = 10.0 * jnp.log10(jnp.sum(est ** 2, axis=-1) + 1e-3)  # [B, C]
        return loss.mean(axis=-1)


class CompositeLoss:
    """30*L1 for empty-bubble samples; r*L1 + (1-r)*si-sdr-family otherwise
    (`CompositeLoss.py:6-59`). Returns the scalar combined loss."""

    def __init__(self, r: float = 0.95, loss_type: str = "sisdr"):
        self.r = r
        self.loss_type = loss_type

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        assert est.shape[1] == 1 and gt.shape[1] == 1
        est, gt = est[:, 0], gt[:, 0]
        neg = jnp.max(jnp.abs(gt), axis=-1) == 0  # [B]
        l1 = jnp.mean(jnp.abs(est - gt), axis=-1)  # [B]
        if self.loss_type == "sdsdr":
            sdr = (0.75 * neg_sdr(est, gt, "sisdr")
                   + 0.25 * jnp.maximum(neg_sdr(est, gt, "snr"),
                                        neg_sdr(est, gt, "sdsdr")))
        else:
            sdr = neg_sdr(est, gt, self.loss_type)
        n_neg = jnp.sum(neg)
        n_pos = jnp.sum(~neg)
        neg_term = 30.0 * jnp.sum(l1 * neg) / jnp.maximum(n_neg, 1)
        pos_term = (self.r * jnp.sum(l1 * (~neg)) / jnp.maximum(n_pos, 1)
                    + (1 - self.r) * jnp.sum(sdr * (~neg)) / jnp.maximum(n_pos, 1))
        return jnp.where(n_neg > 0, neg_term, 0.0) + jnp.where(n_pos > 0,
                                                               pos_term, 0.0)


def make_pad_mask(lengths, max_len: int | None = None) -> jnp.ndarray:
    """Mask of padded positions: lengths [B] -> bool [B, max_len] with True
    where index >= length (reference `src/losses/mask.py`)."""
    lengths = jnp.asarray(lengths)
    if max_len is None:
        max_len = int(jnp.max(lengths))
    rng = jnp.arange(max_len)[None, :]
    return rng >= lengths[:, None]
