"""Metric conventions (torchmetrics parity where torch is available)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sound_bubble_tpu.metrics import Metrics, compute_decay, si_sdr, si_snr, snr


def test_snr_si_sdr_basics(rng):
    gt = rng.standard_normal((3, 2000)).astype(np.float32)
    est = gt + 0.1 * rng.standard_normal((3, 2000)).astype(np.float32)
    s = np.asarray(snr(jnp.asarray(est), jnp.asarray(gt)))
    assert (s > 15).all() and (s < 25).all()
    # si_sdr scale invariance
    a = np.asarray(si_sdr(jnp.asarray(2.0 * est), jnp.asarray(gt)))
    b = np.asarray(si_sdr(jnp.asarray(est), jnp.asarray(gt)))
    np.testing.assert_allclose(a, b, atol=1e-3)
    # snr is NOT scale invariant
    assert np.abs(np.asarray(snr(jnp.asarray(2 * est), jnp.asarray(gt))) - s).max() > 1


def test_improvement_metrics(rng):
    gt = rng.standard_normal((2, 1, 3000)).astype(np.float32)
    noise = rng.standard_normal((2, 1, 3000)).astype(np.float32)
    mix = gt + noise
    est = gt + 0.1 * noise
    for name in ["snr_i", "si_snr_i", "si_sdr_i"]:
        v = np.asarray(Metrics(name)(est=jnp.asarray(est), gt=jnp.asarray(gt),
                                     mix=jnp.asarray(mix)))
        assert v.shape == (2,)
        assert (v > 5).all(), f"{name}: expected clear improvement, got {v}"


def test_torchmetrics_parity(rng):
    torch = pytest.importorskip("torch")
    try:
        from torchmetrics.functional.audio import (
            scale_invariant_signal_distortion_ratio as t_si_sdr,
            signal_noise_ratio as t_snr,
        )
    except ImportError:
        pytest.skip("torchmetrics not installed")
    gt = rng.standard_normal((4, 1500)).astype(np.float32)
    est = gt + 0.3 * rng.standard_normal((4, 1500)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(snr(jnp.asarray(est), jnp.asarray(gt))),
        t_snr(torch.from_numpy(est), torch.from_numpy(gt)).numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(si_sdr(jnp.asarray(est), jnp.asarray(gt))),
        t_si_sdr(torch.from_numpy(est), torch.from_numpy(gt)).numpy(), atol=1e-3)


def test_decay(rng):
    mix = rng.standard_normal((1, 1, 1000)).astype(np.float32)
    est = 0.01 * mix
    d = np.asarray(compute_decay(jnp.asarray(est), jnp.asarray(mix)))
    np.testing.assert_allclose(d, 40.0, atol=0.1)  # 100x power-down = 40 dB


def test_stoi_sanity(rng):
    from sound_bubble_tpu.metrics.stoi import stoi
    t = np.arange(24000 * 2) / 24000
    # speech-band modulated tone as a crude intelligibility carrier
    clean = (np.sin(2 * np.pi * 440 * t) * (1 + np.sin(2 * np.pi * 4 * t))
             ).astype(np.float32)
    noisy = clean + 2.0 * rng.standard_normal(len(t)).astype(np.float32)
    s_clean = stoi(clean, clean, 24000)
    s_noisy = stoi(clean, noisy, 24000)
    assert 0.95 < s_clean <= 1.0 + 1e-6
    assert s_noisy < s_clean - 0.1


def test_pesq_gated(rng):
    x = rng.standard_normal((1, 1, 24000)).astype(np.float32)
    v = Metrics("PESQ")(est=x, gt=x, mix=x)
    assert np.isnan(np.asarray(v)).all() or np.asarray(v).min() > 4.0
