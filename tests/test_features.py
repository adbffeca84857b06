"""Spatial-feature parity vs a direct numpy transcription of the math."""
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.ops.features import spatial_features


def _naive_omni(real, imag, eps=1e-6):
    """Channel-first [B, M, F, T] like the reference; returns [B, 3(M-1), F, T]."""
    norm = np.sqrt(real ** 2 + imag ** 2)
    n0, nm = norm[:, :1], norm[:, 1:]
    ild = np.log10((nm + eps) / (n0 + eps))
    denom = nm * n0 + eps
    cos = (real[:, 1:] * real[:, :1] + imag[:, 1:] * imag[:, :1]) / denom
    sin = (real[:, :1] * imag[:, 1:] - imag[:, :1] * real[:, 1:]) / denom
    m1 = real.shape[1] - 1
    ipd = np.stack([sin, cos], axis=2).reshape(real.shape[0], 2 * m1,
                                               *real.shape[2:])
    return np.concatenate([ild, ipd], axis=1)


def test_omni_features(rng):
    B, M, T, F = 2, 6, 7, 13
    real = rng.standard_normal((B, M, T, F)).astype(np.float32)
    imag = rng.standard_normal((B, M, T, F)).astype(np.float32)
    out = np.asarray(spatial_features(jnp.asarray(real), jnp.asarray(imag)))
    assert out.shape == (B, T, F, 3 * (M - 1))
    # naive path computed channel-first on [B, M, F, T]
    naive = _naive_omni(real.transpose(0, 1, 3, 2), imag.transpose(0, 1, 3, 2))
    np.testing.assert_allclose(out, naive.transpose(0, 3, 2, 1), atol=2e-4)


def test_directional_features(rng):
    B, M, T, F = 1, 6, 4, 5
    real = rng.standard_normal((B, M, T, F)).astype(np.float32)
    imag = rng.standard_normal((B, M, T, F)).astype(np.float32)
    out = np.asarray(spatial_features(jnp.asarray(real), jnp.asarray(imag),
                                      directional=True))
    assert out.shape == (B, T, F, 3 * (M - 1) - 1)
    norm = np.sqrt(real ** 2 + imag ** 2)
    eps = 1e-6
    np.testing.assert_allclose(
        out[..., 0], np.log10((norm[:, 2] + eps) / (norm[:, 3] + eps))
        .transpose(0, 1, 2), atol=2e-4)
    np.testing.assert_allclose(
        out[..., 1], np.log10((norm[:, 1] + eps) / (norm[:, 0] + eps)), atol=2e-4)
    # IPD block identical to omni variant
    omni = np.asarray(spatial_features(jnp.asarray(real), jnp.asarray(imag)))
    np.testing.assert_allclose(out[..., 4:], omni[..., 5:], atol=1e-6)
