"""STFT/iSTFT op tests: framing, filterbank math, reconstruction, streaming."""
import jax.numpy as jnp
import numpy as np
import pytest

from sound_bubble_tpu.ops.stft import (
    frame, istft, make_stft, mod_pad, overlap_add, stft, stft_filterbank,
)


def test_frame_matches_naive(rng):
    x = rng.standard_normal((2, 3, 288 + 192 * 9)).astype(np.float32)
    fr = np.asarray(frame(jnp.asarray(x), 288, 192))
    naive = np.stack([x[..., i * 192:i * 192 + 288] for i in range(10)], axis=-2)
    np.testing.assert_allclose(fr, naive)


@pytest.mark.parametrize("k,s,t", [(288, 192, 10), (256, 128, 7), (512, 512, 4),
                                   (320, 160, 5), (100, 37, 6)])
def test_frame_general(rng, k, s, t):
    n = (t - 1) * s + k
    x = rng.standard_normal((2, n + 5)).astype(np.float32)  # trailing extra
    x = x[..., :n]
    fr = np.asarray(frame(jnp.asarray(x), k, s))
    naive = np.stack([x[..., i * s:i * s + k] for i in range(t)], axis=-2)
    np.testing.assert_allclose(fr, naive)


def test_stft_matches_windowed_dft(rng):
    fb = make_stft(288, 192)
    x = rng.standard_normal((2, 288 + 192 * 9)).astype(np.float32)
    spec = np.asarray(stft(fb, jnp.asarray(x)))
    filt = stft_filterbank(288, 288, 192)
    frames = np.stack([x[..., i * 192:i * 192 + 288] for i in range(10)], axis=-2)
    np.testing.assert_allclose(spec, frames @ filt.T, atol=1e-4)
    # spot-check one bin against an explicit windowed DFT
    w = np.hanning(289)[:-1] ** 0.5
    scale = 1.0 / (0.5 * np.sqrt(288 * 288 / 192))
    dft_bin = np.fft.fft(frames[0, 0] * w)[7] * scale
    np.testing.assert_allclose(spec[0, 0, 7], dft_bin.real, atol=1e-4)
    np.testing.assert_allclose(spec[0, 0, 145 + 7], dft_bin.imag, atol=1e-4)


def test_overlap_add_matches_naive(rng):
    t, k, s = 10, 288, 192
    f2 = rng.standard_normal((4, t, k)).astype(np.float32)
    ola = np.asarray(overlap_add(jnp.asarray(f2), s))
    nv = np.zeros((4, (t - 1) * s + k), np.float32)
    for i in range(t):
        nv[:, i * s:i * s + k] += f2[:, i]
    np.testing.assert_allclose(ola, nv, atol=1e-5)


def test_roundtrip_is_envelope_scaling(rng):
    """The filterbank rows are a complete orthogonal (windowed) basis, so
    enc->dec == x * envelope elementwise, where the envelope is the summed
    squared-window profile. At hop 192 / kernel 288 this envelope is NOT
    constant (no COLA) — same as the reference's asteroid filterbank; the
    trained network compensates. Mean gain must still be ~1."""
    fb = make_stft(288, 192)
    n = 288 + 192 * 40
    x = rng.standard_normal((2, n)).astype(np.float32)
    y = np.asarray(istft(fb, stft(fb, jnp.asarray(x))))
    assert y.shape[-1] == n
    env = np.asarray(istft(fb, stft(fb, jnp.ones((1, n), np.float32))))[0]
    np.testing.assert_allclose(y[:, 288:-288], (x * env)[:, 288:-288],
                               atol=1e-4)
    assert abs(env[288:-288].mean() - 1.0) < 1e-2


def test_streaming_stft_equivalence(rng):
    """STFT computed over the full signal == concatenation of per-chunk STFTs
    (1 frame per chunk given kernel=chunk+pad, stride=chunk)."""
    fb = make_stft(288, 192)
    n_chunks = 8
    x = rng.standard_normal((1, 192 * n_chunks + 96)).astype(np.float32)
    full = np.asarray(stft(fb, jnp.asarray(x)))
    chunks = [
        np.asarray(stft(fb, jnp.asarray(x[..., i * 192:i * 192 + 288])))
        for i in range(n_chunks)
    ]
    np.testing.assert_allclose(full, np.concatenate(chunks, axis=-2), atol=1e-5)


def test_mod_pad():
    x = jnp.ones((2, 1000))
    xp, mod = mod_pad(x, 192, (0, 96))
    assert mod == 192 * 6 - 1000
    assert xp.shape[-1] == 192 * 6 + 96
    xp2, mod2 = mod_pad(jnp.ones((2, 192 * 4)), 192, (0, 96))
    assert mod2 == 0 and xp2.shape[-1] == 192 * 4 + 96
