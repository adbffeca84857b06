"""Torch-compatible parameter initializers (for training-distribution parity).

The reference model's weights are initialized by PyTorch defaults; matching
those distributions keeps our from-scratch training comparable:
- Linear / Conv: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in));
  bias U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
- LSTM: every weight/bias U(-1/sqrt(hidden), +1/sqrt(hidden)).
- PReLU: 0.25.  LayerNorm: ones/zeros.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_fan(key, shape, fan_in: int, dtype=jnp.float32):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        return uniform_fan(key, shape, fan_in, dtype)
    return init


def lstm_init(hidden: int):
    def init(key, shape, dtype=jnp.float32):
        return uniform_fan(key, shape, hidden, dtype)
    return init
