"""STFT analysis/synthesis as framed matmuls (MXU-friendly).

Semantics follow the reference's encoder/decoder, which is asteroid
`make_enc_dec('stft', n_filters=nfft, kernel_size=nfft, stride=chunk)`
(`/root/reference/src/models/tfgridnet_realtime_clean_dis_embd3/tfgridnet_causal.py:326-330`):

- analysis window: periodic sqrt-Hann of length K (the `window_type` kwarg the
  reference passes is swallowed by the filterbank's **kwargs, so the default
  sqrt-Hann is what actually runs),
- filter rows: `[Re(DFT), Im(DFT)]` of the N-point DFT basis truncated to
  F = N//2+1 bins, globally scaled by `1 / (0.5*sqrt(K*N/stride))`, with the
  DC and Nyquist rows additionally divided by sqrt(2),
- decoder = transposed convolution with the *same* filters (overlap-add).

Output layout here is `[..., T, 2F]` (frames-major, real||imag channels minor)
— channels-minor keeps every downstream projection a trailing-dim matmul on
the MXU. Note `Im(DFT) = -sin`, matching `np.fft.fft` used by the reference.
"""
from __future__ import annotations

import contextlib
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Export workaround: the TFLite converter's reshape-into-batchmatmul fusion
# produces invalid rank-4 `tfl.batch_matmul` ops when the reshape introduces
# singleton dims (streaming T=1). An optimization_barrier between the matmul
# and the reshape blocks that fusion; it is OFF by default (no effect on TPU
# compilation) and enabled only while exporting (runtime/export.py).
_EXPORT_BARRIERS = False


@contextlib.contextmanager
def export_barriers():
    global _EXPORT_BARRIERS
    _EXPORT_BARRIERS = True
    try:
        yield
    finally:
        _EXPORT_BARRIERS = False


def _barrier(x):
    return jax.lax.optimization_barrier(x) if _EXPORT_BARRIERS else x


def stft_filterbank(n_fft: int, kernel_size: int, stride: int) -> np.ndarray:
    """Build the (2F, K) analysis/synthesis filter matrix (float64 numpy)."""
    assert n_fft >= kernel_size
    cutoff = n_fft // 2 + 1
    # periodic Hann, sqrt for analysis+synthesis split
    window = np.hanning(kernel_size + 1)[:-1] ** 0.5
    dft = np.fft.fft(np.eye(n_fft))
    dft /= 0.5 * np.sqrt(kernel_size * n_fft / stride)
    filters = np.vstack([np.real(dft[:cutoff, :]), np.imag(dft[:cutoff, :])])
    filters[0, :] /= np.sqrt(2)
    filters[n_fft // 2, :] /= np.sqrt(2)
    return (filters * window[None, :]).astype(np.float64)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class STFT:
    """Precomputed filterbank. `filters`: (2F, K)."""

    n_fft: int
    kernel_size: int
    stride: int
    filters: jnp.ndarray

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def tree_flatten(self):
        return (self.filters,), (self.n_fft, self.kernel_size, self.stride)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], children[0])


def make_stft(n_fft: int, stride: int, kernel_size: int | None = None,
              dtype=jnp.float32) -> STFT:
    kernel_size = n_fft if kernel_size is None else kernel_size
    filt = jnp.asarray(stft_filterbank(n_fft, kernel_size, stride), dtype=dtype)
    return STFT(n_fft, kernel_size, stride, filt)


def frame(x: jnp.ndarray, kernel_size: int, stride: int) -> jnp.ndarray:
    """[..., N] -> [..., T, K] overlapping frames, T = (N-K)//stride + 1.

    Built from reshapes/concats only (no gather): split the signal into
    stride-sized blocks, then each frame is its block plus the head of the
    following ceil((K-s)/s) blocks. Frames touching the (discarded) tail are
    handled by padding blocks, then slicing T.
    """
    n = x.shape[-1]
    t = (n - kernel_size) // stride + 1
    assert t >= 1, f"signal ({n}) shorter than kernel ({kernel_size})"
    n_extra = -(-(kernel_size - stride) // stride) if kernel_size > stride else 0
    n_blocks = -(-n // stride)
    pad = (n_blocks + n_extra) * stride - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    blocks = xp.reshape(x.shape[:-1] + (n_blocks + n_extra, stride))
    pieces = [blocks[..., i:i + t, :] for i in range(n_extra + 1)]
    frames = jnp.concatenate(pieces, axis=-1)[..., :kernel_size]
    return frames


def overlap_add(frames: jnp.ndarray, stride: int) -> jnp.ndarray:
    """[..., T, K] -> [..., (T-1)*stride + K] by summing shifted frames.

    Pure reshape/pad/add (no scatter — scatters are slow on TPU and
    unsupported by several export runtimes)."""
    t, k = frames.shape[-2], frames.shape[-1]
    n = (t - 1) * stride + k
    n_pieces = -(-k // stride)
    lead = frames.shape[:-2]
    pads0 = [(0, 0)] * len(lead)
    fpad = jnp.pad(frames, pads0 + [(0, 0), (0, n_pieces * stride - k)])
    total_len = n + n_pieces * stride
    total = jnp.zeros(lead + (total_len,), frames.dtype)
    for i in range(n_pieces):
        piece = fpad[..., :, i * stride:(i + 1) * stride]
        piece = piece.reshape(lead + (t * stride,))
        total = total + jnp.pad(
            piece, pads0 + [(i * stride, total_len - (i + t) * stride)])
    return total[..., :n]


def stft(fb: STFT, x: jnp.ndarray) -> jnp.ndarray:
    """[..., N] -> [..., T, 2F] (real spectrum rows then imag rows, minor).

    The projection is a flat 2-D matmul (leading dims folded) — identical
    math, and rank-2 dots survive every export backend (TFLite's batch_matmul
    is rank-3-only)."""
    frames = frame(x, fb.kernel_size, fb.stride)
    lead = frames.shape[:-1]
    flat = frames.reshape(-1, fb.kernel_size)
    out = _barrier(flat @ fb.filters.T)
    return out.reshape(lead + (out.shape[-1],))


def istft(fb: STFT, spec: jnp.ndarray) -> jnp.ndarray:
    """[..., T, 2F] -> [..., (T-1)*stride + K] via transposed filterbank."""
    lead = spec.shape[:-1]
    flat = spec.reshape(-1, spec.shape[-1])
    frames = _barrier(flat @ fb.filters).reshape(lead + (fb.kernel_size,))
    return overlap_add(frames, fb.stride)


def mod_pad(x: jnp.ndarray, chunk_size: int, pad: tuple[int, int]):
    """Pad [..., N] up to a chunk multiple, then by (back, front) lookahead.

    Mirrors the reference `mod_pad` (`dis_embd3/net.py:8-18`): returns the
    padded signal and the number of appended mod samples (static int).
    """
    n = x.shape[-1]
    mod = (chunk_size - n % chunk_size) % chunk_size
    widths = [(0, 0)] * (x.ndim - 1) + [(pad[0], mod + pad[1])]
    return jnp.pad(x, widths), mod
