"""DCCRN baseline: deep complex convolution recurrent network.

Capability parity with `/root/reference/src/models/DCCRN/network.py`:
conv-STFT frontend (sqrt-Hann, win 512 / hop 100 / fft 512), complex conv
U-Net encoder (freq stride 2, causal time padding) + (complex-)LSTM
bottleneck + complex transposed-conv decoder with skips, E/C/R masking modes,
normalized-OLA conv-iSTFT, mic-mean output, [-1,1] clipping.

Notes vs the reference: its forward overwrites `imag` with `real`
(`network.py:179` — a transcription bug); we use the true imaginary part.
BatchNorm keeps torch-semantics running statistics in the flax
`batch_stats` collection (train=True: normalize with batch stats + update
running averages; train=False: normalize with running averages — the
reference's module.train()/eval() behavior).
"""
from __future__ import annotations

from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import Linear, PReLU
from sound_bubble_tpu.ops.rnn import init_lstm_params, lstm
from sound_bubble_tpu.ops.stft import frame, overlap_add


@lru_cache(maxsize=4)
def _stft_kernels(win_len: int, fft_len: int, win_type: str = "hann"):
    """Forward/inverse conv-STFT kernels (reference `conv_stft.init_kernels`):
    sqrt window, rfft basis rows, inverse = pinv."""
    import scipy.signal

    window = scipy.signal.get_window(win_type, win_len, fftbins=True) ** 0.5
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]           # [win, F]
    fwd = np.concatenate([np.real(basis), np.imag(basis)], 1).T  # [2F, win]
    inv = np.linalg.pinv(fwd).T                               # [2F, win]
    return ((fwd * window).astype(np.float32),
            (inv * window).astype(np.float32),
            window.astype(np.float32))


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm semantics per channel (channel-minor input):
    batch statistics + running-average update in train mode, running
    averages in eval mode (momentum 0.1, unbiased running var)."""
    dim: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.dim,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.dim,)))
        axes = tuple(range(x.ndim - 1))
        if train:
            mu = jnp.mean(x, axis=axes)
            var = jnp.mean((x - mu) ** 2, axis=axes)
            n = x.size // self.dim
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mu
                ra_var.value = ((1 - m) * ra_var.value
                                + m * var * n / max(n - 1, 1))
        else:
            mu, var = ra_mean.value, ra_var.value
        return (x - mu) / jnp.sqrt(var + self.eps) * g + b


class ComplexConv2d(nn.Module):
    """(real, imag) pair conv; kernel (kf, kt) = (5, 2), freq stride 2,
    freq pad 2, causal left time pad. x: ([B,T,Fq,C], [B,T,Fq,C])."""
    out_channels: int  # per real/imag half
    k_freq: int = 5
    k_time: int = 2
    stride_freq: int = 2

    @nn.compact
    def __call__(self, xr, xi):
        cin = xr.shape[-1]
        fan = cin * self.k_freq * self.k_time
        init = nn.initializers.normal(0.05)
        wr = self.param("real_kernel", init,
                        (self.k_time, self.k_freq, cin, self.out_channels))
        wi = self.param("imag_kernel", init,
                        (self.k_time, self.k_freq, cin, self.out_channels))
        br = self.param("real_bias", nn.initializers.zeros,
                        (self.out_channels,))
        bi = self.param("imag_bias", nn.initializers.zeros,
                        (self.out_channels,))

        def conv(x, w):
            x = jnp.pad(x, ((0, 0), (self.k_time - 1, 0), (0, 0), (0, 0)))
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, self.stride_freq),
                padding=[(0, 0), (2, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        rr, ri = conv(xr, wr) + br, conv(xr, wi) + bi
        ir, ii = conv(xi, wr) + br, conv(xi, wi) + bi
        return rr - ii, ri + ir


class ComplexConvTranspose2d(nn.Module):
    """Transposed complex conv: kernel (5,2), freq stride 2 with
    output_padding 1, time 'valid' then caller trims (reference
    padding=(2,0), output_padding=(1,0), then out[..., 1:])."""
    out_channels: int
    k_freq: int = 5
    k_time: int = 2
    stride_freq: int = 2

    @nn.compact
    def __call__(self, xr, xi):
        cin = xr.shape[-1]
        init = nn.initializers.normal(0.05)
        wr = self.param("real_kernel", init,
                        (self.k_time, self.k_freq, cin, self.out_channels))
        wi = self.param("imag_kernel", init,
                        (self.k_time, self.k_freq, cin, self.out_channels))
        br = self.param("real_bias", nn.initializers.zeros,
                        (self.out_channels,))
        bi = self.param("imag_bias", nn.initializers.zeros,
                        (self.out_channels,))

        def deconv(x, w):
            # ConvTranspose2d(kernel (5,2), freq stride 2, freq padding 2,
            # freq output_padding 1, time stride 1/padding 0) as an ordinary
            # conv on the freq-dilated input with the flipped kernel:
            # freq pads = (k-1-p, k-1-p+output_padding) = (2, 3); time pads
            # (k_time-1, k_time-1) = (1, 1) giving T+1 (caller trims).
            kf, kt = self.k_freq, self.k_time
            return jax.lax.conv_general_dilated(
                x, w[::-1, ::-1], window_strides=(1, 1),
                padding=[(kt - 1, kt - 1), (kf - 3, kf - 2)],
                lhs_dilation=(1, self.stride_freq),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        rr, ri = deconv(xr, wr) + br, deconv(xr, wi) + bi
        ir, ii = deconv(xi, wr) + br, deconv(xi, wi) + bi
        return rr - ii, ri + ir


class Net(nn.Module):
    """forward(inputs) -> {'output': [B,1,T], 'next_state': None}."""
    n_mics: int = 6
    rnn_layers: int = 2
    rnn_units: int = 128
    win_len: int = 512
    win_inc: int = 100
    fft_len: int = 512
    win_type: str = "hann"
    masking_mode: str = "E"
    use_clstm: bool = False
    use_cbn: bool = False
    kernel_size: int = 5
    kernel_num: tuple = (16, 32, 64, 128, 256, 256)
    look_ahead: bool = True
    fair_compare: bool = False
    loss_type: str = "sisdr"
    r: float = 0.0

    uses_batch_stats = True

    @nn.compact
    def __call__(self, inputs, input_state=None, pad=True, train=False):
        x = inputs["mixture"]
        fwd_k, inv_k, window = _stft_kernels(self.win_len, self.fft_len,
                                             self.win_type)
        fwd_k, inv_k = jnp.asarray(fwd_k), jnp.asarray(inv_k)
        if self.look_ahead:
            psz = (self.win_len - 2 * self.win_inc, self.win_inc)
        else:
            psz = (self.win_len - self.win_inc, 0)
        x = jnp.pad(x, ((0, 0), (0, 0), psz))
        b, m, t = x.shape
        nf = self.fft_len // 2 + 1

        frames = frame(x, self.win_len, self.win_inc)      # [B, M, T', win]
        spec = frames @ fwd_k.T                            # [B, M, T', 2F]
        real, imag = spec[..., :nf], spec[..., nf:]

        mags = jnp.sqrt(real ** 2 + imag ** 2 + 1e-8)
        phase = jnp.arctan2(imag, real)

        # encoder input: drop the DC bin; channels = [real mics | imag mics]
        # layout [B, T', Fq, C]
        xr = jnp.moveaxis(real[..., 1:], 1, -1)            # [B, T', Fq, M]
        xi = jnp.moveaxis(imag[..., 1:], 1, -1)
        kn = (self.n_mics,) + tuple(self.kernel_num)
        skips = []
        for i in range(len(kn) - 1):
            xr, xi = ComplexConv2d(kn[i + 1], name=f"enc{i}")(xr, xi)
            xc = jnp.concatenate([xr, xi], axis=-1)
            xc = BatchNorm(2 * kn[i + 1], name=f"enc_bn{i}")(xc, train)
            xc = PReLU(name=f"enc_act{i}")(xc)
            xr, xi = xc[..., :kn[i + 1]], xc[..., kn[i + 1]:]
            skips.append((xr, xi))

        # bottleneck over time: [B, T', Fq*C]
        bq, tq, fq, cq = xr.shape
        if self.use_clstm:
            rin = xr.reshape(bq, tq, fq * cq)
            iin = xi.reshape(bq, tq, fq * cq)
            for li in range(self.rnn_layers):
                in_dim = rin.shape[-1]
                pr = self.param(f"clstm{li}_real",
                                lambda k, s=(in_dim, self.rnn_units // 2):
                                init_lstm_params(k, s[0], s[1]))
                pi = self.param(f"clstm{li}_imag",
                                lambda k, s=(in_dim, self.rnn_units // 2):
                                init_lstm_params(k, s[0], s[1]))
                r2r, _ = lstm(pr, rin)
                r2i, _ = lstm(pi, rin)
                i2r, _ = lstm(pr, iin)
                i2i, _ = lstm(pi, iin)
                rin, iin = r2r - i2i, i2r + r2i
                if li == self.rnn_layers - 1:
                    rin = Linear(fq * cq, name=f"clstm{li}_rproj")(rin)
                    iin = Linear(fq * cq, name=f"clstm{li}_iproj")(iin)
            xr = rin.reshape(bq, tq, fq, cq)
            xi = iin.reshape(bq, tq, fq, cq)
        else:
            z = jnp.concatenate([xr, xi], axis=-1).reshape(bq, tq, -1)
            in_dim = z.shape[-1]
            for li in range(self.rnn_layers):
                p = self.param(f"lstm{li}", lambda k, s=(
                    in_dim if li == 0 else self.rnn_units, self.rnn_units):
                    init_lstm_params(k, s[0], s[1]))
                z, _ = lstm(p, z)
            z = Linear(in_dim, name="tranform")(z)
            z = z.reshape(bq, tq, fq, 2 * cq)
            xr, xi = z[..., :cq], z[..., cq:]

        # decoder with complex-cat skips
        for i in range(len(kn) - 1, 0, -1):
            sr, si = skips[i - 1]
            xr = jnp.concatenate([xr, sr], axis=-1)
            xi = jnp.concatenate([xi, si], axis=-1)
            xr, xi = ComplexConvTranspose2d(kn[i - 1] if i != 1
                                            else self.n_mics,
                                            name=f"dec{i}")(xr, xi)
            xr, xi = xr[:, 1:], xi[:, 1:]  # reference out[..., 1:] time trim
            if i != 1:
                xc = jnp.concatenate([xr, xi], axis=-1)
                xc = BatchNorm(2 * kn[i - 1], name=f"dec_bn{i}")(xc, train)
                xc = PReLU(name=f"dec_act{i}")(xc)
                xr, xi = xc[..., :kn[i - 1]], xc[..., kn[i - 1]:]

        # mask: pad the DC bin back; [B, M, T', F]
        mask_r = jnp.pad(jnp.moveaxis(xr, -1, 1), (
            (0, 0), (0, 0), (0, 0), (1, 0)))
        mask_i = jnp.pad(jnp.moveaxis(xi, -1, 1), (
            (0, 0), (0, 0), (0, 0), (1, 0)))

        if self.masking_mode == "E":
            mask_mags = jnp.sqrt(mask_r ** 2 + mask_i ** 2)
            mask_phase = jnp.arctan2(mask_i / (mask_mags + 1e-8),
                                     mask_r / (mask_mags + 1e-8))
            est_mags = jnp.tanh(mask_mags) * mags
            est_phase = phase + mask_phase
            out_r = est_mags * jnp.cos(est_phase)
            out_i = est_mags * jnp.sin(est_phase)
        elif self.masking_mode == "C":
            out_r = real * mask_r - imag * mask_i
            out_i = real * mask_i + imag * mask_r
        else:  # 'R'
            out_r = real * mask_r
            out_i = imag * mask_i

        out_r = out_r.mean(axis=1)                         # mic mean
        out_i = out_i.mean(axis=1)
        out_spec = jnp.concatenate([out_r, out_i], axis=-1)  # [B, T', 2F]

        # normalized-OLA iSTFT
        y = overlap_add(out_spec @ inv_k, self.win_inc)
        env_frames = jnp.tile(jnp.asarray(window)[None, :] ** 2,
                              (out_spec.shape[1], 1))
        env = overlap_add(env_frames, self.win_inc)
        y = y / (env + 1e-8)
        y = jnp.clip(y, -1.0, 1.0)
        y = y[:, self.win_len - self.win_inc:]
        return {"output": y[:, None, :], "next_state": None}
