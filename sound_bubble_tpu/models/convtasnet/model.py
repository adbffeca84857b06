"""Conv-TasNet baseline (non-streaming wrapper, causal TCN option).

Capability parity with `/root/reference/src/models/Convtasnet/`
(speechbrain Encoder/Decoder + Kaituo-Xu-style TCN MaskNet): encoder
Conv1d(n_mics->N, kernel 2L, stride L)+ReLU; cLN -> bottleneck 1x1 -> R
repeats x X dilated depthwise temporal blocks (residual) -> mask 1x1 ->
ReLU mask; masked latent decoded by ConvTranspose1d(N->1, 2L, stride L).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import Linear, PReLU
from sound_bubble_tpu.ops.init import linear_init
from sound_bubble_tpu.ops.stft import frame, mod_pad, overlap_add

EPS = 1e-8


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over (T, C) jointly; affine (C,)."""
    dim: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        g = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=(1, 2), keepdims=True)
        return (x - mu) / jnp.sqrt(var + EPS) * g + b


class ChannelwiseLayerNorm(nn.Module):
    """cLN: per-frame normalization over channels; affine (C,)."""
    dim: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        g = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + EPS) * g + b


def _norm(norm_type, dim, name):
    if norm_type == "gLN":
        return GlobalLayerNorm(dim, name=name)
    return ChannelwiseLayerNorm(dim, name=name)


class DepthwiseSeparableConv(nn.Module):
    """depthwise dilated conv (causal or same) -> PReLU -> norm ->
    pointwise (no bias). x: [B, T, H] -> [B, T, out]."""
    out_channels: int
    kernel_size: int
    dilation: int
    norm_type: str
    causal: bool

    @nn.compact
    def __call__(self, x):
        h = x.shape[-1]
        k, d = self.kernel_size, self.dilation
        wd = self.param("dw_kernel", linear_init(k), (k, h))
        bd = self.param("dw_bias", linear_init(k), (h,))
        span = (k - 1) * d
        if self.causal:
            xp = jnp.pad(x, ((0, 0), (span, 0), (0, 0)))
        else:
            xp = jnp.pad(x, ((0, 0), (span // 2, span - span // 2), (0, 0)))
        t = x.shape[1]
        y = bd + sum(xp[:, i * d:i * d + t] * wd[i] for i in range(k))
        y = PReLU(name="act")(y)
        y = _norm(self.norm_type, h, "norm")(y)
        return Linear(self.out_channels, use_bias=False, name="pw")(y)


class TemporalBlock(nn.Module):
    hidden: int
    kernel_size: int
    dilation: int
    norm_type: str
    causal: bool

    @nn.compact
    def __call__(self, x):  # [B, T, Bc]
        bc = x.shape[-1]
        y = Linear(self.hidden, use_bias=False, name="conv")(x)
        y = PReLU(name="act")(y)
        y = _norm(self.norm_type, self.hidden, "norm")(y)
        y = DepthwiseSeparableConv(bc, self.kernel_size, self.dilation,
                                   self.norm_type, self.causal,
                                   name="DSconv")(y)
        return x + y


class MaskNet(nn.Module):
    N: int
    B: int
    H: int
    P: int
    X: int
    R: int
    C: int = 1
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"

    @nn.compact
    def __call__(self, w):  # [B, T, N] -> mask [C, B, T, N]
        y = ChannelwiseLayerNorm(self.N, name="layer_norm")(w)
        y = Linear(self.B, use_bias=False, name="bottleneck")(y)
        for r in range(self.R):
            for xi in range(self.X):
                y = TemporalBlock(self.H, self.P, 2 ** xi, self.norm_type,
                                  self.causal,
                                  name=f"temporalblock_{r}_{xi}")(y)
        score = Linear(self.C * self.N, use_bias=False, name="mask_conv")(y)
        score = score.reshape(score.shape[:-1] + (self.C, self.N))
        score = jnp.moveaxis(score, -2, 0)  # [C, B, T, N]
        if self.mask_nonlinear == "softmax":
            return jax.nn.softmax(score, axis=0)
        if self.mask_nonlinear == "relu":
            return jax.nn.relu(score)
        raise ValueError("Unsupported mask non-linear function")


class Net(nn.Module):
    """Reference ConvTasNet `Net`: forward(inputs, input_state=None,
    pad=False) -> {'output', 'next_state': None} (non-streaming)."""
    num_mic: int = 2
    L: int = 8
    N: int = 256
    B: int = 256
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 4
    causal: bool = True
    norm_type: str = "cLN"

    @nn.compact
    def __call__(self, inputs, input_state=None, pad=False):
        x = inputs["mixture"]
        x, mod = mod_pad(x, self.L, (0, self.L))
        b, m, n = x.shape
        k = 2 * self.L
        # encoder: Conv1d(m -> N, kernel 2L, stride L, no bias) + relu
        we = self.param("enc_kernel", linear_init(m * k), (m * k, self.N))
        fr = frame(x, k, self.L)                       # [B, M, T', 2L]
        fr = jnp.moveaxis(fr, 1, 2).reshape(b, -1, m * k)
        lat = jax.nn.relu(fr @ we)                     # [B, T', N]

        mask = MaskNet(self.N, self.B, self.H, self.P, self.X, self.R, 1,
                       self.norm_type, self.causal, name="separator")(lat)
        out_lat = lat * mask[0]

        # decoder: ConvTranspose1d(N -> 1, kernel 2L, stride L, no bias)
        wd = self.param("dec_kernel", linear_init(k), (self.N, k))
        frames = out_lat @ wd                          # [B, T', 2L]
        y = overlap_add(frames, self.L)[:, None, :]
        y = y[..., :-self.L]
        if mod:
            y = y[..., :-mod]
        return {"output": y, "next_state": None}
