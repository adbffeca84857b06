"""Waveformer baseline: streaming time-domain separation.

Capability parity with `/root/reference/src/models/Waveformer/net.py`:
dilated-causal-conv encoder with per-layer context buffers + causal
chunked transformer decoder with sliding K/V context + masked transposed-conv
resynthesis. TPU-native notes:

- every dilated depthwise conv consumes [ctx | x] with valid padding (the
  streaming state is the concatenated per-layer context, exactly the
  reference's single flat `enc_buf`);
- the chunked causal attention evaluates all chunks as a batch of
  (chunk x ctx+chunk) attentions (einsum on the MXU), one forward for
  offline and streaming;
- state is the reference's (enc_buf, dec_buf, out_buf) tuple.
Dropout is inference-disabled (deterministic) — train-time dropout of the
torch baseline is not replicated.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import LayerNorm, Linear
from sound_bubble_tpu.ops.init import linear_init
from sound_bubble_tpu.ops.stft import mod_pad, overlap_add


def sinusoidal_pos_enc(max_len: int, dim: int) -> np.ndarray:
    pe = np.zeros((max_len, dim), np.float32)
    pos = np.arange(max_len)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class DepthwiseSeparableConv(nn.Module):
    """depthwise k=3 dilated conv -> LN -> relu -> pointwise -> LN -> relu.
    x: [B, T_in, C] (valid padding) -> [B, T_out, C]."""
    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        c, d = self.channels, self.dilation
        wd = self.param("dw_kernel", linear_init(3), (3, c))
        bd = self.param("dw_bias", linear_init(3), (c,))
        # depthwise dilated conv, valid: out[t] = sum_k x[t + k*d] * w[k]
        t_out = x.shape[1] - 2 * d
        y = (x[:, :t_out] * wd[0] + x[:, d:d + t_out] * wd[1]
             + x[:, 2 * d:2 * d + t_out] * wd[2] + bd)
        y = LayerNorm(c, name="norm1")(y)
        y = jax.nn.relu(y)
        y = Linear(c, name="pw")(y)
        y = LayerNorm(c, name="norm2")(y)
        return jax.nn.relu(y)


class DilatedCausalConvEncoder(nn.Module):
    channels: int
    num_layers: int

    @property
    def buf_lengths(self):
        return [2 * 2 ** i for i in range(self.num_layers)]

    def init_ctx_buf(self, batch_size):
        total = 2 * (2 ** self.num_layers - 1)
        return jnp.zeros((batch_size, self.channels, total))

    @nn.compact
    def __call__(self, x, ctx_buf):
        """x: [B, T, C]; ctx_buf: [B, C, total] (reference layout)."""
        idx = 0
        new_ctx = []
        for i in range(self.num_layers):
            blen = 2 * 2 ** i
            ctx = ctx_buf[:, :, idx:idx + blen].transpose(0, 2, 1)
            idx += blen
            dcc_in = jnp.concatenate([ctx, x], axis=1)
            new_ctx.append(dcc_in[:, -blen:].transpose(0, 2, 1))
            x = x + DepthwiseSeparableConv(self.channels, 2 ** i,
                                           name=f"dcc_{i}")(dcc_in)
        return x, jnp.concatenate(new_ctx, axis=-1)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention semantics (joint in-proj, out-proj)."""
    dim: int
    nhead: int

    @nn.compact
    def __call__(self, q, k, v):
        d, h = self.dim, self.nhead
        hd = d // h
        wq = self.param("wq", linear_init(d), (d, d))
        wk = self.param("wk", linear_init(d), (d, d))
        wv = self.param("wv", linear_init(d), (d, d))
        b_in = self.param("b_in", nn.initializers.zeros, (3, d))
        wo = self.param("wo", linear_init(d), (d, d))
        bo = self.param("bo", linear_init(d), (d,))

        def split(x):
            return x.reshape(x.shape[:-1] + (h, hd))

        qh = split(q @ wq + b_in[0])          # [B, Tq, h, hd]
        kh = split(k @ wk + b_in[1])
        vh = split(v @ wv + b_in[2])
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        return out.reshape(q.shape[:-1] + (d,)) @ wo + bo


class CausalTransformerDecoderLayer(nn.Module):
    """torch TransformerDecoderLayer (post-norm), queries = last chunk only."""
    dim: int
    nhead: int
    ff_dim: int

    @nn.compact
    def __call__(self, tgt, mem, chunk_size):
        q = tgt[:, -chunk_size:]
        sa = MultiheadAttention(self.dim, self.nhead, name="self_attn")(
            q, tgt, tgt)
        q = LayerNorm(self.dim, name="norm1")(q + sa)
        ca = MultiheadAttention(self.dim, self.nhead, name="cross_attn")(
            q, mem, mem)
        q = LayerNorm(self.dim, name="norm2")(q + ca)
        ff = Linear(self.ff_dim, name="ff1")(q)
        ff = Linear(self.dim, name="ff2")(jax.nn.relu(ff))
        return LayerNorm(self.dim, name="norm3")(q + ff)


def _causal_unfold(x, ctx_len, chunk_size):
    """[B, ctx+L, C] -> [B*num_chunks, ctx+chunk, C] sliding chunks."""
    b, t, c = x.shape
    num = (t - ctx_len) // chunk_size
    starts = np.arange(num) * chunk_size
    win = ctx_len + chunk_size
    chunks = jnp.stack([x[:, s:s + win] for s in starts], axis=1)
    return chunks.reshape(b * num, win, c)


class CausalTransformerDecoder(nn.Module):
    model_dim: int
    ctx_len: int
    chunk_size: int
    num_layers: int
    nhead: int
    use_pos_enc: bool
    ff_dim: int

    def init_ctx_buf(self, batch_size):
        return jnp.zeros((batch_size, self.num_layers + 1, self.ctx_len,
                          self.model_dim))

    @nn.compact
    def __call__(self, tgt, mem, ctx_buf):
        """tgt/mem: [B, C, T] channel-first like the reference."""
        mem, _ = mod_pad(mem, self.chunk_size, (0, 0))
        tgt, mod = mod_pad(tgt, self.chunk_size, (0, 0))
        b, c, t = tgt.shape
        tgt = tgt.transpose(0, 2, 1)
        mem = mem.transpose(0, 2, 1)
        pe = jnp.asarray(sinusoidal_pos_enc(
            max(200, self.ctx_len + self.chunk_size), self.model_dim))

        new_ctx = [None] * (self.num_layers + 1)
        mem = jnp.concatenate([ctx_buf[:, 0], mem], axis=1)
        new_ctx[0] = mem[:, -self.ctx_len:]
        mem_ctx = _causal_unfold(mem, self.ctx_len, self.chunk_size)
        if self.use_pos_enc:
            mem_ctx = mem_ctx + pe[None, :mem_ctx.shape[1]]

        for i in range(self.num_layers):
            tgt_full = jnp.concatenate([ctx_buf[:, i + 1], tgt], axis=1)
            new_ctx[i + 1] = tgt_full[:, -self.ctx_len:]
            tgt_ctx = _causal_unfold(tgt_full, self.ctx_len, self.chunk_size)
            if self.use_pos_enc and i == 0:
                tgt_ctx = tgt_ctx + pe[None, :tgt_ctx.shape[1]]
            out = CausalTransformerDecoderLayer(
                self.model_dim, self.nhead, self.ff_dim,
                name=f"layer{i}")(tgt_ctx, mem_ctx, self.chunk_size)
            tgt = out.reshape(b, t, c)

        tgt = tgt.transpose(0, 2, 1)
        if mod:
            tgt = tgt[..., :-mod]
        return tgt, jnp.stack(new_ctx, axis=1)


class MaskNet(nn.Module):
    enc_dim: int
    num_enc_layers: int
    dec_dim: int
    dec_buf_len: int
    dec_chunk_size: int
    num_dec_layers: int
    use_pos_enc: bool
    skip_connection: bool
    proj: bool

    @nn.compact
    def __call__(self, x, enc_buf, dec_buf):
        """x: [B, C, T] -> (mask, enc_buf, dec_buf)."""
        encoder = DilatedCausalConvEncoder(self.enc_dim, self.num_enc_layers,
                                           name="encoder")
        xt, enc_buf = encoder(x.transpose(0, 2, 1), enc_buf)
        x = xt.transpose(0, 2, 1)

        if self.proj:
            # grouped 1x1 conv enc->dec (groups=dec_dim): each output channel
            # sees enc_dim/dec_dim inputs
            g = self.enc_dim // self.dec_dim
            w = self.param("proj_e2d_kernel", linear_init(g),
                           (self.dec_dim, g))
            bias = self.param("proj_e2d_bias", linear_init(g), (self.dec_dim,))
            xg = xt.reshape(xt.shape[0], xt.shape[1], self.dec_dim, g)
            e = jax.nn.relu(jnp.einsum("btdg,dg->btd", xg, w) + bias)
            m, dec_buf = CausalTransformerDecoder(
                self.dec_dim, self.dec_buf_len, self.dec_chunk_size,
                self.num_dec_layers, 8, self.use_pos_enc, 2 * self.dec_dim,
                name="decoder")(e.transpose(0, 2, 1), e.transpose(0, 2, 1),
                                dec_buf)
            # grouped 1x1 conv dec->enc
            w2 = self.param("proj_d2e_kernel", linear_init(1),
                            (self.dec_dim, g))
            b2 = self.param("proj_d2e_bias", linear_init(1), (self.enc_dim,))
            mt = m.transpose(0, 2, 1)                       # [B, T, dec]
            me = jnp.einsum("btd,dg->btdg", mt, w2).reshape(
                mt.shape[0], mt.shape[1], self.enc_dim)
            m = jax.nn.relu(me + b2).transpose(0, 2, 1)
        else:
            m, dec_buf = CausalTransformerDecoder(
                self.enc_dim, self.dec_buf_len, self.dec_chunk_size,
                self.num_dec_layers, 8, self.use_pos_enc, 2 * self.enc_dim,
                name="decoder")(x, x, dec_buf)
        if self.skip_connection:
            m = x + m
        return m, enc_buf, dec_buf


class Net(nn.Module):
    """Reference Waveformer `Net`: forward(inputs, input_state, pad) ->
    {'output', 'next_state'} with state = (enc_buf, dec_buf, out_buf)."""
    n_mics: int = 1
    L: int = 8
    enc_dim: int = 512
    num_enc_layers: int = 10
    dec_dim: int = 256
    dec_buf_len: int = 100
    num_dec_layers: int = 2
    dec_chunk_size: int = 72
    out_buf_len: int = 2
    r: float = 1.0
    use_pos_enc: bool = True
    skip_connection: bool = True
    proj: bool = True
    lookahead: bool = True
    fair_compare: bool = False
    loss_type: str = "sisdr"

    def init_buffers(self, batch_size, device=None):
        enc_total = 2 * (2 ** self.num_enc_layers - 1)
        model_dim = self.dec_dim if self.proj else self.enc_dim
        return (jnp.zeros((batch_size, self.enc_dim, enc_total)),
                jnp.zeros((batch_size, self.num_dec_layers + 1,
                           self.dec_buf_len, model_dim)),
                jnp.zeros((batch_size, self.enc_dim, self.out_buf_len)))

    @nn.compact
    def __call__(self, inputs, input_state=None, pad=True):
        x = inputs["mixture"]
        if input_state is None:
            input_state = self.init_buffers(x.shape[0])
        enc_buf, dec_buf, out_buf = input_state
        mod = 0
        if pad:
            x, mod = mod_pad(x, self.L,
                             (0, 6 * self.L) if self.lookahead else (0, 0))

        # in_conv: Conv1d(n_mics -> enc_dim, k=7L (or L), stride L) + relu
        ksize = 7 * self.L if self.lookahead else self.L
        wk = self.param("in_conv_kernel", linear_init(self.n_mics * ksize),
                        (self.n_mics * ksize, self.enc_dim))
        n = x.shape[-1]
        t_frames = (n - ksize) // self.L + 1
        starts = np.arange(t_frames) * self.L
        frames = jnp.stack([x[..., s:s + ksize] for s in starts], axis=1)
        frames = frames.reshape(x.shape[0], t_frames, -1)
        lat = jax.nn.relu(frames @ wk).transpose(0, 2, 1)   # [B, enc, T']

        m, enc_buf, dec_buf = MaskNet(
            self.enc_dim, self.num_enc_layers, self.dec_dim,
            self.dec_buf_len, self.dec_chunk_size, self.num_dec_layers,
            self.use_pos_enc, self.skip_connection, self.proj,
            name="mask_gen")(lat, enc_buf, dec_buf)

        y = lat * m
        y = jnp.concatenate([out_buf, y], axis=-1)          # [B, enc, T'+2]
        out_buf = y[..., -self.out_buf_len:]

        # out_conv: ConvTranspose1d(enc->1, k=3L, stride L, pad 2L, no bias)
        wo = self.param("out_conv_kernel",
                        linear_init((self.out_buf_len + 1) * self.L),
                        (self.enc_dim, (self.out_buf_len + 1) * self.L))
        fr = jnp.einsum("bct,ck->btk", y, wo)
        ola = overlap_add(fr, self.L)
        p = self.out_buf_len * self.L
        t_total = (y.shape[-1] - 1) * self.L + wo.shape[-1] - 2 * p
        y = ola[..., p:p + t_total][:, None, :]
        if mod:
            y = y[..., :-mod]
        return {"output": y, "next_state": (enc_buf, dec_buf, out_buf)}
