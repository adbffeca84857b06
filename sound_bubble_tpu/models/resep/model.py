"""RE-SepFormer baseline (resource-efficient separator, non-causal).

Capability parity with `/root/reference/src/models/resep_vb/`:
conv encoder (kernel 32, stride 16) -> segment-level transformer blocks with
an "av" memory transformer carrying a summary state between segments ->
PReLU + 1x1 output head -> per-speaker ReLU masks -> transposed-conv decoder.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import LayerNorm, Linear, PReLU
from sound_bubble_tpu.models.waveformer.model import (
    MultiheadAttention, sinusoidal_pos_enc,
)
from sound_bubble_tpu.ops.init import linear_init
from sound_bubble_tpu.ops.stft import frame, mod_pad, overlap_add


class TransformerEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (speechbrain norm_before=True)."""
    dim: int
    nhead: int
    ff_dim: int

    @nn.compact
    def __call__(self, x):
        z = LayerNorm(self.dim, name="norm1")(x)
        x = x + MultiheadAttention(self.dim, self.nhead, name="mha")(z, z, z)
        z = LayerNorm(self.dim, name="norm2")(x)
        z = Linear(self.ff_dim, name="ff1")(z)
        z = Linear(self.dim, name="ff2")(jax.nn.relu(z))
        return x + z


class SBTransformerBlock(nn.Module):
    """Reference `SBTransformerBlock_wnormandskip`: positional encoding +
    N pre-norm layers, with outer skip + norm."""
    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int
    use_positional_encoding: bool = True
    use_norm: bool = True
    use_skip: bool = True

    @nn.compact
    def __call__(self, x):
        src = x
        if self.use_positional_encoding:
            pe = jnp.asarray(sinusoidal_pos_enc(x.shape[1], self.d_model))
            x = x + pe[None]
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(self.d_model, self.nhead, self.d_ffn,
                                        name=f"layer{i}")(x)
        x = LayerNorm(self.d_model, name="final_norm")(x)
        if self.use_skip:
            x = x + src
        if self.use_norm:
            x = LayerNorm(self.d_model, name="out_norm")(x)
        return x


class ResourceEfficientSeparator(nn.Module):
    input_dim: int
    num_spk: int
    unit: int
    segment_size: int
    layer: int
    seg_layers: int = 8
    nhead: int = 8
    d_ffn: int = 1024

    @nn.compact
    def __call__(self, feats):
        """feats: [B, T, N] -> masks [num_spk, B, T, N]."""
        b, t, n = feats.shape
        rest = (self.segment_size - t % self.segment_size) % self.segment_size
        x = jnp.pad(feats, ((0, 0), (0, rest), (0, 0)))
        s = x.shape[1] // self.segment_size
        x = x.reshape(b * s, self.segment_size, n)

        hc = jnp.zeros((b * s, 1, n))
        for i in range(self.layer):
            x = SBTransformerBlock(self.seg_layers, n, self.nhead, self.d_ffn,
                                   name=f"seg{i}")(x + hc)
            if i < self.layer - 1:
                # "av" memory: segment means processed by the memory model
                hc = x.mean(axis=1)[None]                  # [1, BS, N]
                hc = SBTransformerBlock(self.seg_layers, n, self.nhead,
                                        self.d_ffn,
                                        name=f"mem{i}")(hc)
                hc = hc.transpose(1, 0, 2)                 # [BS, 1, N]

        x = x.reshape(b, s * self.segment_size, n)[:, :t]
        x = PReLU(name="out_act")(x)
        x = Linear(n * self.num_spk, name="out_fc")(x)
        x = x.reshape(b, t, n, self.num_spk)
        return jnp.moveaxis(jax.nn.relu(x), -1, 0)


class Net(nn.Module):
    """forward(inputs) -> {'output': [B, n_spk, T], 'next_state': None}."""
    num_mics: int = 6
    num_spk: int = 1
    model_dim: int = 128
    buf_size: int = 70

    n_channels: int = 256
    kernel_size: int = 32
    segment_size: int = 150

    @nn.compact
    def __call__(self, inputs, input_state=None, pad=True):
        x = inputs["mixture"]
        stride = self.kernel_size // 2
        x, mod = mod_pad(x, stride, (0, stride))
        b, m, n = x.shape
        we = self.param("enc_kernel", linear_init(m * self.kernel_size),
                        (m * self.kernel_size, self.n_channels))
        fr = frame(x, self.kernel_size, stride)
        fr = jnp.moveaxis(fr, 1, 2).reshape(b, -1, m * self.kernel_size)
        lat = jax.nn.relu(fr @ we)                         # [B, T', N]

        masks = ResourceEfficientSeparator(
            self.n_channels, self.num_spk, 256, self.segment_size, 2,
            name="separator")(lat)

        wd = self.param("dec_kernel", linear_init(self.kernel_size),
                        (self.n_channels, self.kernel_size))
        outs = []
        for spk in range(self.num_spk):
            frames = (lat * masks[spk]) @ wd
            y = overlap_add(frames, stride)
            outs.append(y)
        y = jnp.stack(outs, axis=1)
        y = y[..., :n]
        y = y[..., :-stride]
        if mod:
            y = y[..., :-mod]
        return {"output": y, "next_state": None}
