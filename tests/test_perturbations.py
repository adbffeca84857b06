"""Perturbation-chain behavior tests."""
import numpy as np

from sound_bubble_tpu.data.perturbations import (
    AudioPerturbations, ChannelDropPerturbation, ChannelGainPerturbation,
    FrequencyMaskingPerturbation, PeakNormPerturbation,
    SampleShiftPerturbation, SpeedPerturbation, WhitePinkBrownPerturbation,
)


def _sig(rng, c=6, t=8000):
    return (rng.standard_normal((c, t)).astype(np.float32),
            rng.standard_normal((1, t)).astype(np.float32))


def test_channel_drop(rng):
    np.random.seed(0)
    a, g = _sig(rng)
    pa, pg = ChannelDropPerturbation(2)(a.copy(), g.copy())
    zeroed = [i for i in range(6) if np.abs(pa[i]).max() == 0]
    assert 1 <= len(zeroed) <= 2 and 0 not in zeroed  # never the ref channel
    np.testing.assert_array_equal(pg, g)


def test_channel_gain_follows_reference(rng):
    np.random.seed(1)
    a, g = _sig(rng)
    pa, pg = ChannelGainPerturbation(6)(a.copy(), g.copy())
    gain0 = pa[0, 100] / a[0, 100]
    np.testing.assert_allclose(pg[0], g[0] * gain0, rtol=1e-5)


def test_sample_shift_is_roll(rng):
    np.random.seed(2)
    a, g = _sig(rng)
    pa, pg = SampleShiftPerturbation(5)(a.copy(), g.copy())
    for i in range(6):
        found = any(np.allclose(pa[i], np.roll(a[i], s))
                    for s in range(-5, 6))
        assert found


def test_speed_keeps_length(rng):
    np.random.seed(3)
    a, g = _sig(rng)
    pa, pg = SpeedPerturbation(0.9, 1.1)(a, g)
    assert pa.shape == a.shape and pg.shape == g.shape


def test_freq_masking_zeroes_bins(rng):
    np.random.seed(4)
    a, g = _sig(rng, t=8192)
    pa, pg = FrequencyMaskingPerturbation(5, 10)(a.copy(), g.copy())
    assert pa.shape == a.shape
    assert not np.allclose(pa, a)  # actually changed


def test_noise_and_peaknorm(rng):
    np.random.seed(5)
    a, g = _sig(rng)
    pa, pg = WhitePinkBrownPerturbation()(a.copy(), g.copy())
    assert not np.allclose(pa, a)
    np.testing.assert_array_equal(pg, g)
    pa2, pg2 = PeakNormPerturbation(0.4, 0.9)(a.copy(), g.copy())
    ratio = pa2[0, 50] / a[0, 50]
    np.testing.assert_allclose(pg2 / ratio, g, rtol=1e-4)


def test_chain_probability(rng):
    np.random.seed(6)
    a, g = _sig(rng)
    chain = AudioPerturbations([
        {"type": "src.datasets.perturbations.ChannelGainPerturbation."
                 "ChannelGainPerturbation",
         "prob": 1.0, "params": {"max_channel_gain_db": 3}},
        {"type": "sound_bubble_tpu.data.perturbations.ChannelDropPerturbation",
         "prob": 0.0, "params": {"max_channel_drops": 5}},
    ])
    pa, pg = chain.apply_random_perturbations(a.copy(), g.copy())
    assert not np.allclose(pa, a)          # prob 1 applied
    assert all(np.abs(pa[i]).max() > 0 for i in range(6))  # prob 0 skipped
