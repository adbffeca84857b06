"""Causal TF-GridNet with FiLM distance conditioning — TPU-native.

Capability parity with the reference's production separator
(`/root/reference/src/models/tfgridnet_realtime_clean_dis_embd3/` and the
unconditioned `tfgridnet_realtime_clean_optim/` variant), re-designed for
XLA/TPU:

- activations are channel-minor `[B, T, F, C]` so every projection is a
  trailing-dim matmul on the MXU;
- the streaming state is an explicit pytree threaded through `__call__`
  (same key names as the reference `init_buffers`:
  conv_buf / deconv_buf / istft_buf / gridnet_bufs.bufN.{h0,c0,K_buf,V_buf});
- offline and streaming share ONE forward: offline = a single call with T
  frames (LSTM input projections hoisted into one big matmul, `lax.scan`
  carries only the recurrence), streaming = the same call with T=1;
- local causal attention is block-banded (queries in W-sized blocks attend to
  two adjacent key blocks + band mask) — an O(T·W) MXU formulation instead of
  the reference's `unfold` copies (`tfgridnet_causal.py:722-744`).

Architecture (reference `tfgridnet_causal.py:233-552`): STFT -> [real||imag of
all mics ++ ILD/IPD] -> causal Conv2d(3x3) [+LN] -> B x GridNetBlock (FiLM of
the distance embedding between blocks) -> causal ConvTranspose2d(3x3) ->
(optional spectral masking) -> stateful overlap-add iSTFT.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sound_bubble_tpu.ops.features import spatial_features
from sound_bubble_tpu.ops.init import linear_init, uniform_fan
from sound_bubble_tpu.ops.rnn import blstm, init_blstm_params, init_lstm_params, lstm
from sound_bubble_tpu.ops.stft import STFT, istft, make_stft, mod_pad, stft


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Mirrors the reference `Net.__init__` kwargs (`dis_embd3/net.py:21-26`)."""

    stft_chunk_size: int = 192
    stft_pad_size: int = 96
    stft_back_pad: int = 0
    num_ch: int = 6
    D: int = 32           # embedding dim
    B: int = 6            # number of GridNet blocks
    I: int = 1            # unused (kept for config parity)
    J: int = 1            # unused (kept for config parity)
    L: int = 4            # attention heads
    H: int = 64           # LSTM hidden
    E: int = 2            # per-head attention emb dim
    use_attn: bool = False
    lookahead: bool = True
    local_atten_len: int = 100
    chunk_causal: bool = True
    num_src: int = 1
    spectral_masking: bool = False
    use_first_ln: bool = False
    merge_method: str = "None"
    directional: bool = False
    conv_lstm: bool = True
    lstm_down: int = 4
    fb_type: str = "stft"
    dis_type: str = "conv3"
    conditional: bool = True  # False => `tfgridnet_realtime_clean_optim` variant
    eps: float = 1e-5
    # rematerialize each GridNetBlock in the backward pass: activations are
    # held for one block at a time instead of all B blocks (the LSTM scans
    # over T dominate activation memory; without this, the production config
    # at batch 8 x 4.5 s needs ~48 GB HBM vs ~8 GB with remat).
    remat: bool = True
    # "bf16" runs the GridNet trunk in bfloat16 while the INPUT WAVEFORM,
    # STFT, spatial features, and iSTFT stay fp32 (mixed-precision training/
    # serving without quantizing the log-ratio ILD/IPD front-end). None =
    # trunk follows the input dtype.
    compute_dtype: str | None = None

    @property
    def n_fft(self) -> int:
        return self.stft_back_pad + self.stft_chunk_size + self.stft_pad_size

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def n_feat(self) -> int:
        """Spatial feature channels (reference `Feat_num`)."""
        n = 3 * (self.num_ch - 1)
        return n - 1 if self.directional else n

    @property
    def conv_in(self) -> int:
        if self.merge_method == "early_cat":
            return 2 * self.num_ch + self.n_feat
        return 2 * self.num_ch

    @property
    def istft_lookback(self) -> int:
        pad = self.n_fft - self.stft_chunk_size
        return 1 + (pad - 1) // pad  # == 1 whenever there is any overlap

    @property
    def embed_width(self) -> int:
        """Distance-embedding channel count D_in (reference dis_type table)."""
        return {"linear1": 1, "linear2": self.D, "conv1": 1, "conv2": 2,
                "conv3": 4, "conv4": 8}[self.dis_type]


def init_state(cfg: NetConfig, batch_size: int, dtype=jnp.float32):
    """Zero streaming state (reference `init_buffers`, same key names)."""
    F, D = cfg.n_freqs, cfg.D
    st: dict[str, Any] = {
        "conv_buf": jnp.zeros((batch_size, 2, F, cfg.conv_in), dtype),
        "deconv_buf": jnp.zeros((batch_size, 2, F, D), dtype),
        "istft_buf": jnp.zeros(
            (batch_size, cfg.num_src, cfg.istft_lookback, 2 * F), dtype),
    }
    bufs = {}
    for i in range(cfg.B):
        b = {
            "h0": jnp.zeros((batch_size, F, cfg.H), dtype),
            "c0": jnp.zeros((batch_size, F, cfg.H), dtype),
        }
        if cfg.use_attn:
            w = cfg.local_atten_len - 1
            b["K_buf"] = jnp.zeros((batch_size, cfg.L, w, F * cfg.E), dtype)
            b["V_buf"] = jnp.zeros((batch_size, cfg.L, w, F * (D // cfg.L)), dtype)
        bufs[f"buf{i}"] = b
    st["gridnet_bufs"] = bufs
    return st


# ---------------------------------------------------------------- layers ----

def _prelu(x, a):
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class LayerNorm(nn.Module):
    """Affine LayerNorm over the trailing `dim` features (torch semantics)."""
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        # stats in fp32 even under bf16 mixed precision (mean/var of bf16
        # activations lose ~2 digits; the normalize is VPU-bound anyway)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.eps) * g.astype(jnp.float32) \
            + b.astype(jnp.float32)
        return y.astype(x.dtype)


class Linear(nn.Module):
    features: int
    use_bias: bool = True
    fan_in: int | None = None  # for torch-compatible init override

    @nn.compact
    def __call__(self, x):
        fan = self.fan_in if self.fan_in is not None else x.shape[-1]
        w = self.param("kernel", linear_init(fan), (x.shape[-1], self.features))
        y = x @ w
        if self.use_bias:
            y = y + self.param("bias", linear_init(fan), (self.features,))
        return y


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), ())
        return _prelu(x, a)


class CausalConv2d(nn.Module):
    """3x3 conv: valid over time (input pre-padded by the 2-frame state
    buffer), 'same' over frequency. x: [B, T+2, F, Cin] -> [B, T, F, Cout]."""
    features: int
    t_ksize: int = 3
    f_ksize: int = 3

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        fan = cin * self.t_ksize * self.f_ksize
        w = self.param("kernel", linear_init(fan),
                       (self.t_ksize, self.f_ksize, cin, self.features))
        b = self.param("bias", linear_init(fan), (self.features,))
        # conv is dtype-strict (unlike matmul): follow the activation dtype
        # so a bf16 trunk works against fp32 init-time params
        w, b = w.astype(x.dtype), b.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=[(0, 0), (self.f_ksize // 2, self.f_ksize // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class CausalDeconv2d(nn.Module):
    """ConvTranspose2d(k=3, padding=(2,1)) equivalent: a correlation with the
    double-flipped kernel, valid over (pre-buffered) time, same over freq."""
    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        fan = self.features * 9  # torch ConvTranspose fan_in = out_ch * k * k
        w = self.param("kernel", linear_init(fan), (3, 3, cin, self.features))
        b = self.param("bias", linear_init(fan), (self.features,))
        w, b = w.astype(x.dtype), b.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w[::-1, ::-1], window_strides=(1, 1),
            padding=[(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class DisEmbed(nn.Module):
    """Distance-conditioning embedding (reference `Dis_Embed_Conv/_Linear`).

    one-hot [B, label_len] -> [B, F, D_in]."""
    cfg: NetConfig

    @nn.compact
    def __call__(self, e):
        cfg = self.cfg
        F = cfg.n_freqs
        d_in = cfg.embed_width
        if cfg.dis_type.startswith("conv"):
            e = Linear(F * d_in, use_bias=False, name="proj")(e)
            e = e.reshape(e.shape[0], F, d_in)
            return LayerNorm(d_in, name="norm")(e)
        if cfg.dis_type == "linear1":
            e = Linear(F, use_bias=False, name="proj")(e)
            e = LayerNorm(F, name="norm")(e)
            return e[..., None]                    # [B, F, 1]
        # linear2: joint (E*F) projection
        e = Linear(F * cfg.D, use_bias=False, name="proj")(e)
        e = LayerNorm(F * cfg.D, name="norm")(e)
        return e.reshape(e.shape[0], cfg.D, F).transpose(0, 2, 1)


class FiLM(nn.Module):
    """Per-(freq, channel) scale+bias from the distance embedding
    (reference `FilmLayer`, `tfgridnet_causal.py:51-68`)."""
    features: int

    @nn.compact
    def __call__(self, x, emb):
        # x: [B, T, F, C]; emb: [B, F, D_in]
        w = Linear(self.features, name="weight")(emb)  # pointwise conv1d == linear
        b = Linear(self.features, name="bias")(emb)
        return x * w[:, None] + b[:, None]


class IntraBand(nn.Module):
    """Sub-band module: bidirectional LSTM across frequency.

    conv_lstm=False: LN -> BLSTM(F) -> Linear (reference `:818-824`).
    conv_lstm=True:  strided Conv1d downsample -> PReLU -> LN -> BLSTM ->
                     ConvTranspose1d upsample (+fixed pad-3, trim) (`:800-815`).
    x: [B, T, F, C] -> [B, T, F, C] (residual added by caller)."""
    cfg: NetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        B, T, F, C = x.shape
        if not cfg.conv_lstm:
            z = LayerNorm(C, eps=cfg.eps, name="norm")(x)
            z = z.reshape(B * T, F, C)
            p = self.param("blstm", _blstm_initializer(C, cfg.H))
            z = blstm(p, z)
            z = Linear(C, name="proj")(z)
            return z.reshape(B, T, F, C)
        s = cfg.lstm_down
        k = F // s                          # floor((F - s)/s) + 1 for k==stride
        z = x.reshape(B * T, F, C)[:, :k * s]
        z = z.reshape(B * T, k, s * C)      # non-overlapping stride-s framing
        z = Linear(C, fan_in=C * s, name="down")(z)  # == Conv1d(C,C,k=s,s)
        z = PReLU(name="act")(z)
        z = LayerNorm(C, name="norm")(z)
        p = self.param("blstm", _blstm_initializer(C, cfg.H))
        z = blstm(p, z)                     # [BT, k, 2H]
        # ConvTranspose1d(2H->C, k=s, stride=s): one matmul + reshape
        fan = C * s                         # torch fan_in = out_ch * k
        wd = self.param("up_kernel", linear_init(fan), (2 * cfg.H, s, C))
        bd = self.param("up_bias", linear_init(fan), (C,))
        z = jnp.einsum("btH,Hsc->btsc", z, wd) + bd
        z = z.reshape(B * T, k * s, C)
        # reference pads 3 zeros then trims to F (`:811-813`); padded rows
        # carry no bias, exactly like F.pad after the deconv.
        if k * s < F:
            z = jnp.pad(z, ((0, 0), (0, F - k * s), (0, 0)))
        return z[:, :F].reshape(B, T, F, C)


def _blstm_initializer(c, h):
    def init(key):
        return init_blstm_params(key, c, h)
    return init


def _lstm_initializer(c, h):
    def init(key):
        return init_lstm_params(key, c, h)
    return init


class AttnProj(nn.Module):
    """Q/K/V projection: Linear -> PReLU -> head split -> LN over (F*E)
    (reference `attn_conv_{Q,K,V}`, `tfgridnet_causal.py:643-675`).
    x: [B, T, F, C] -> [B, heads, T, F*e]."""
    heads: int
    e: int

    @nn.compact
    def __call__(self, x):
        B, T, F, _ = x.shape
        z = Linear(self.heads * self.e, name="proj")(x)
        z = PReLU(name="act")(z)
        z = z.reshape(B, T, F, self.heads, self.e)
        z = z.transpose(0, 3, 1, 2, 4).reshape(B, self.heads, T, F * self.e)
        return LayerNorm(F * self.e, name="norm")(z)


def _local_attention(q, k_full, v_full, window):
    """Banded causal local attention.

    q: [B, h, T, dk]; k_full/v_full: [B, h, T+W-1, d*] where index j holds
    frame j-(W-1); query t attends k_full[t .. t+W-1] (W past frames incl.
    current). Returns [B, h, T, dv].
    """
    B, h, T, dk = q.shape
    W = window
    scale = 1.0 / math.sqrt(dk)
    if T <= W:
        scores = jnp.einsum("bhtd,bhjd->bhtj", q, k_full,
                            preferred_element_type=jnp.float32) * scale
        j = jnp.arange(k_full.shape[2])[None, :]
        t = jnp.arange(T)[:, None]
        mask = (j >= t) & (j <= t + W - 1)
        scores = jnp.where(mask[None, None], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhtj,bhjd->bhtd", probs, v_full,
                          preferred_element_type=jnp.float32)
    # blocked path: pad T to a multiple of W; query block b attends the
    # 2W-wide kv slab k_full[bW : bW+2W].
    nb = -(-T // W)
    pad_q = nb * W - T
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kv_len = nb * W + W  # slab for last block ends at (nb-1)W + 2W
    def pad_kv(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, kv_len - a.shape[2]), (0, 0)))
    kp, vp = pad_kv(k_full), pad_kv(v_full)
    qb = qp.reshape(B, h, nb, W, dk)
    k_slab = jnp.stack([jax.lax.dynamic_slice_in_dim(kp, i * W, 2 * W, 2)
                        for i in range(nb)], axis=2)   # [B,h,nb,2W,dk]
    v_slab = jnp.stack([jax.lax.dynamic_slice_in_dim(vp, i * W, 2 * W, 2)
                        for i in range(nb)], axis=2)
    scores = jnp.einsum("bhnrd,bhnjd->bhnrj", qb, k_slab,
                        preferred_element_type=jnp.float32) * scale
    r = jnp.arange(W)[:, None]
    j = jnp.arange(2 * W)[None, :]
    mask = (j >= r) & (j <= r + W - 1)                  # exactly W keys per row
    scores = jnp.where(mask[None, None, None], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnrj,bhnjd->bhnrd", probs, v_slab,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, h, nb * W, -1)[:, :, :T]


class GridNetBlock(nn.Module):
    """One TF-GridNet block: intra-frequency BLSTM + stateful inter-time LSTM
    + optional local causal attention (reference `GridNetBlock`)."""
    cfg: NetConfig

    @nn.compact
    def __call__(self, x, state):
        cfg = self.cfg
        B, T, F, C = x.shape
        new_state = dict(state)

        # --- intra (frequency) ---
        x = x + IntraBand(cfg, name="intra")(x)

        # --- inter (time), carries (h, c) across calls: THE streaming memory
        z = LayerNorm(C, eps=cfg.eps, name="inter_norm")(x)
        z = z.transpose(0, 2, 1, 3)                      # [B, F, T, C]
        p = self.param("inter_lstm", _lstm_initializer(C, cfg.H))
        z, (hT, cT) = lstm(p, z, state["h0"], state["c0"])
        new_state["h0"], new_state["c0"] = hT, cT
        z = Linear(C, name="inter_proj")(z)
        x = x + z.transpose(0, 2, 1, 3)

        # --- local causal attention (production configs: off) ---
        if cfg.use_attn:
            W = cfg.local_atten_len
            vd = C // cfg.L
            q = AttnProj(cfg.L, cfg.E, name="attn_q")(x)
            k = AttnProj(cfg.L, cfg.E, name="attn_k")(x)
            v = AttnProj(cfg.L, vd, name="attn_v")(x)
            k_full = jnp.concatenate([state["K_buf"], k], axis=2)
            v_full = jnp.concatenate([state["V_buf"], v], axis=2)
            new_state["K_buf"] = k_full[:, :, -(W - 1):]
            new_state["V_buf"] = v_full[:, :, -(W - 1):]
            o = _local_attention(q, k_full, v_full, W)   # [B, L, T, F*vd]
            o = o.reshape(B, cfg.L, T, F, vd)
            o = o.transpose(0, 2, 3, 1, 4).reshape(B, T, F, C)
            o = Linear(C, name="attn_out_proj")(o)
            o = PReLU(name="attn_out_act")(o)
            o = LayerNorm(F * C, name="attn_out_norm")(o.reshape(B, T, F * C))
            x = x + o.reshape(B, T, F, C)
        return x, new_state


class Net(nn.Module):
    """Reference `Net` wrapper: mod-pad + TFGridNet core.

    __call__(inputs, input_state=None, pad=True) -> {'output', 'next_state'}
    with inputs = {'mixture': [B, M, N], 'dis_embed': [B, 3]} (dis_embed
    ignored when cfg.conditional is False), matching `dis_embd3/net.py:84-93`.
    """
    cfg: NetConfig

    def init_buffers(self, batch_size):
        return init_state(self.cfg, batch_size)

    def _trunk_dtype(self, x):
        if self.cfg.compute_dtype == "bf16":
            return jnp.bfloat16
        return x.dtype

    @nn.compact
    def __call__(self, inputs, input_state=None, pad=True):
        cfg = self.cfg
        x = inputs["mixture"]
        if input_state is None:
            input_state = init_state(cfg, x.shape[0], self._trunk_dtype(x))
        mod = 0
        if pad:
            psz = ((cfg.stft_back_pad, cfg.stft_pad_size)
                   if cfg.lookahead else (0, 0))
            x, mod = mod_pad(x, cfg.stft_chunk_size, psz)
        emb = None
        if cfg.conditional:
            emb = DisEmbed(cfg, name="dis_embed")(inputs["dis_embed"])
            emb = emb.astype(self._trunk_dtype(x))
        y, next_state = self._core(x, emb, input_state)
        if mod:
            y = y[..., :-mod]
        return {"output": y, "next_state": next_state}

    def _core(self, x, emb, state):
        cfg = self.cfg
        # STFT front-end + spatial features run fp32 even under bf16 mixed
        # precision: the log-ratio ILD/IPD features amplify bf16 rounding on
        # near-silent bins, and this path is a sliver of total FLOPs. The
        # GridNet trunk (where the matmuls are) keeps x.dtype.
        fb = make_stft(cfg.n_fft, cfg.stft_chunk_size, dtype=jnp.float32)
        F = cfg.n_freqs
        B = x.shape[0]
        next_state = dict(state)

        spec = stft(fb, x.astype(jnp.float32))       # [B, M, T, 2F] fp32
        T = spec.shape[2]
        real, imag = spec[..., :F], spec[..., F:]

        base = jnp.concatenate([real, imag], axis=1)  # [B, 2M, T, F]
        base = jnp.moveaxis(base, 1, -1)              # [B, T, F, 2M]
        if cfg.merge_method == "early_cat":
            feats = spatial_features(real, imag, cfg.directional)
            feat = jnp.concatenate([base, feats], axis=-1)
        else:
            feat = base
        feat = feat.astype(self._trunk_dtype(x))

        full = jnp.concatenate([state["conv_buf"], feat], axis=1)
        next_state["conv_buf"] = full[:, -2:]
        h = CausalConv2d(cfg.D, name="conv")(full)    # [B, T, F, D]
        if cfg.use_first_ln:
            h = LayerNorm(cfg.D, name="first_ln")(h)

        bufs = dict(state["gridnet_bufs"])
        block_cls = GridNetBlock
        if cfg.remat:
            # SB_REMAT_POLICY: "none" recomputes everything in backward
            # (min HBM); "dots" saves matmul outputs (trades HBM for fewer
            # backward recomputes — measured via bench.py)
            import os
            policy = {"dots": jax.checkpoint_policies.dots_saveable,
                      "dots_no_batch":
                      jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      }.get(os.environ.get("SB_REMAT_POLICY", "none"))
            block_cls = nn.remat(GridNetBlock, policy=policy)
        for i in range(cfg.B):
            if i > 0 and cfg.conditional:
                h = FiLM(cfg.D, name=f"film{i - 1}")(h, emb)
            h, bufs[f"buf{i}"] = block_cls(cfg, name=f"block{i}")(
                h, bufs[f"buf{i}"])
        next_state["gridnet_bufs"] = bufs

        full = jnp.concatenate([state["deconv_buf"], h], axis=1)
        next_state["deconv_buf"] = full[:, -2:]
        out = CausalDeconv2d(cfg.num_src * 2, name="deconv")(full)
        out = out.astype(jnp.float32)    # iSTFT back-end in fp32 (see above)
        out = out.reshape(B, T, F, cfg.num_src, 2)
        # -> [B, n_srcs, T, 2F] (real rows then imag, like the input spec)
        est = jnp.concatenate(
            [out[..., 0].transpose(0, 3, 1, 2), out[..., 1].transpose(0, 3, 1, 2)],
            axis=-1)
        if cfg.spectral_masking:
            est = est * spec[:, :cfg.num_src]

        full_spec = jnp.concatenate([state["istft_buf"], est], axis=2)
        # keep the carried state's dtype (est is fp32 under mixed precision;
        # a bf16 streaming scan needs a dtype-stable carry)
        next_state["istft_buf"] = full_spec[:, :, -cfg.istft_lookback:] \
            .astype(state["istft_buf"].dtype)
        chunk = cfg.stft_chunk_size
        lookahead_pad = cfg.n_fft - chunk  # back_pad + pad
        if cfg.stft_back_pad == 0:
            y = istft(fb, full_spec)
            y = y[..., :-lookahead_pad]
        else:
            # reference `causal_decoder` (`tfgridnet_causal.py:423-431`):
            # per-frame synthesis, drop the first look_back samples of each
            # frame, add the previous frame's last (back+pad) samples onto
            # the current frame's head, keep the first `chunk` samples.
            # (The reference's overlap arithmetic is off by `back_pad`
            # relative to exact OLA; replicated verbatim for parity.)
            B2, S2, Tp, _ = full_spec.shape
            frames = (full_spec.reshape(-1, 2 * F) @ fb.filters)
            frames = frames.reshape(B2, S2, Tp, cfg.n_fft)
            frames = frames[..., cfg.stft_back_pad:]     # len chunk+pad
            la = lookahead_pad
            prev_tail = jnp.concatenate(
                [jnp.zeros_like(frames[:, :, :1, -la:]),
                 frames[:, :, :-1, -la:]], axis=2)
            head_add = jnp.pad(
                prev_tail,
                [(0, 0), (0, 0), (0, 0), (0, frames.shape[-1] - la)])
            frames = frames + head_add
            y = frames[..., :chunk].reshape(B2, S2, Tp * chunk)
        y = y[..., cfg.istft_lookback * chunk:]
        return y, next_state


def make_net(model_params: dict, conditional: bool = True) -> Net:
    """Build a Net from a reference-style `model_params` JSON dict."""
    known = {f.name for f in dataclasses.fields(NetConfig)}
    kwargs = {k: v for k, v in model_params.items() if k in known}
    kwargs["conditional"] = conditional
    return Net(NetConfig(**kwargs))


def net_from_params(**model_params) -> Net:
    """Config-system entry point: the distance-conditioned production model
    (reference `tfgridnet_realtime_clean_dis_embd3.net.Net`)."""
    return make_net(model_params, conditional=True)


def net_optim_from_params(**model_params) -> Net:
    """Config-system entry point: unconditioned edge variant
    (reference `tfgridnet_realtime_clean_optim.net.Net`)."""
    return make_net(model_params, conditional=False)
