"""Offline DCC-TF baseline (label-conditioned target sound extraction).

Capability parity with the reference's non-causal DCC-TF variants
(`/root/reference/src/models/{Waveformer,DCCRN}/non_causal_dcc_tf.py`):
dilated ('same'-padded, non-causal) conv encoder; label embedding MLP
multiplied into the latent; chunked transformer decoder over 3-chunk windows;
masked transposed-conv resynthesis with tanh output.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import LayerNorm, Linear
from sound_bubble_tpu.models.waveformer.model import (
    CausalTransformerDecoderLayer, _causal_unfold, sinusoidal_pos_enc,
)
from sound_bubble_tpu.ops.init import linear_init
from sound_bubble_tpu.ops.stft import frame, mod_pad, overlap_add


class DilatedConvEncoder(nn.Module):
    """Non-causal variant: depthwise-separable dilated convs with 'same'
    padding and residuals."""
    channels: int
    num_layers: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        c = self.channels
        for i in range(self.num_layers):
            d = 2 ** i
            wd = self.param(f"dw{i}", linear_init(3), (3, c))
            bd = self.param(f"dwb{i}", linear_init(3), (c,))
            xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
            t = x.shape[1]
            y = (xp[:, :t] * wd[0] + xp[:, d:d + t] * wd[1]
                 + xp[:, 2 * d:2 * d + t] * wd[2] + bd)
            y = LayerNorm(c, name=f"norm1_{i}")(y)
            y = jax.nn.relu(y)
            y = Linear(c, name=f"pw{i}")(y)
            y = LayerNorm(c, name=f"norm2_{i}")(y)
            x = x + jax.nn.relu(y)
        return x


class Net(nn.Module):
    label_len: int = 41
    L: int = 8
    enc_dim: int = 512
    num_enc_layers: int = 10
    dec_dim: int = 256
    dec_chunk_size: int = 72
    num_dec_layers: int = 2
    use_pos_enc: bool = True

    @nn.compact
    def __call__(self, inputs, input_state=None, pad=True):
        x = inputs["mixture"]
        label = inputs.get("label",
                           jnp.ones((x.shape[0], self.label_len)))
        x, mod = mod_pad(x, self.L, (0, 0))
        b, m, n = x.shape

        # in_conv: Conv1d(m -> enc_dim, kernel L, stride L) + relu
        wk = self.param("in_conv_kernel", linear_init(m * self.L),
                        (m * self.L, self.enc_dim))
        fr = frame(x, self.L, self.L)
        fr = jnp.moveaxis(fr, 1, 2).reshape(b, -1, m * self.L)
        lat = jax.nn.relu(fr @ wk)                          # [B, T', enc]

        # label embedding MLP -> multiplied into the latent
        e = Linear(512, name="label_fc1")(label)
        e = jax.nn.relu(LayerNorm(512, name="label_norm1")(e))
        e = Linear(self.enc_dim, name="label_fc2")(e)
        e = jax.nn.relu(LayerNorm(self.enc_dim, name="label_norm2")(e))
        lat = lat * e[:, None, :]

        z = DilatedConvEncoder(self.enc_dim, self.num_enc_layers,
                               name="encoder")(lat)

        # project to decoder dim, run chunked (3-chunk window) transformer
        zd = jax.nn.relu(Linear(self.dec_dim, name="proj_e2d")(z))
        zp, zmod = mod_pad(zd.transpose(0, 2, 1), self.dec_chunk_size, (0, 0))
        zp = zp.transpose(0, 2, 1)
        ctx = 2 * self.dec_chunk_size
        zfull = jnp.pad(zp, ((0, 0), (ctx, 0), (0, 0)))
        pe = jnp.asarray(sinusoidal_pos_enc(3 * self.dec_chunk_size,
                                            self.dec_dim))
        tgt = zp
        mem_ctx = _causal_unfold(zfull, ctx, self.dec_chunk_size)
        if self.use_pos_enc:
            mem_ctx = mem_ctx + pe[None]
        for i in range(self.num_dec_layers):
            tfull = jnp.pad(tgt, ((0, 0), (ctx, 0), (0, 0)))
            tgt_ctx = _causal_unfold(tfull, ctx, self.dec_chunk_size)
            if self.use_pos_enc and i == 0:
                tgt_ctx = tgt_ctx + pe[None]
            out = CausalTransformerDecoderLayer(
                self.dec_dim, 8, 2 * self.dec_dim, name=f"dec{i}")(
                tgt_ctx, mem_ctx, self.dec_chunk_size)
            tgt = out.reshape(zp.shape)
        if zmod:
            tgt = tgt[:, :-zmod]
        mask = jax.nn.relu(Linear(self.enc_dim, name="proj_d2e")(tgt))
        y_lat = z * mask

        # out_conv: ConvTranspose1d(enc -> 1, kernel 2L, stride L) + tanh
        wo = self.param("out_conv_kernel", linear_init(2 * self.L),
                        (self.enc_dim, 2 * self.L))
        frames = y_lat @ wo
        y = overlap_add(frames, self.L)[:, None, :]
        y = jnp.tanh(y[..., :n])
        if mod:
            y = y[..., :-mod]
        return {"output": y, "next_state": None}
