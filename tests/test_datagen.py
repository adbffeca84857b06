"""Datagen tests: ISM physics, SNR-exact mixing, end-to-end sample dirs."""
import json
import os

import numpy as np
import pytest

from sound_bubble_tpu.datagen.ism import (
    ShoeBox, compute_rir, measure_rt60, shoebox_images,
)
from sound_bubble_tpu.datagen.mixing import (
    rescale_mixture_to_target_snr, snr_at_reference,
)

FS = 24000
C = 343.0


def test_image_count_order1():
    imgs, refl = shoebox_images([5, 4, 3], [2, 2, 1.5], 1)
    assert len(imgs) == 7  # source + 6 first-order wall images
    assert (refl <= 1).all() and (refl == 0).sum() == 1


def test_direct_path_delay_and_level():
    src = np.array([1.0, 1.0, 1.0])
    mic = np.array([4.0, 1.0, 1.0])  # 3 m away
    imgs, refl = shoebox_images([50, 50, 50], src, 0)
    rir = compute_rir(imgs, refl, mic, FS, 2000, absorption=0.5)
    peak = np.argmax(np.abs(rir))
    expected = 3.0 / C * FS
    assert abs(peak - expected) <= 1
    np.testing.assert_allclose(np.abs(rir).max(), 1 / (4 * np.pi * 3.0),
                               rtol=0.05)


def test_interchannel_delay():
    """Sub-sample ITD between two mics must match geometry."""
    src = np.array([5.0, 5.0, 1.5])
    m1 = np.array([2.0, 5.0, 1.5])
    m2 = np.array([2.2, 5.0, 1.5])
    imgs, refl = shoebox_images([100, 100, 100], src, 0)
    r1 = compute_rir(imgs, refl, m1, FS, 4000, 0.5)
    r2 = compute_rir(imgs, refl, m2, FS, 4000, 0.5)
    # cross-correlate to find delay difference: (d1-d2)/c = 0.2m/c
    xc = np.correlate(r1, r2, mode="full")
    lag = np.argmax(xc) - (len(r2) - 1)
    expected = 0.2 / C * FS  # ~14 samples
    assert abs(abs(lag) - expected) <= 1


def test_rt60_monotonic_in_absorption():
    rts = []
    for absorption in (0.2, 0.7):
        room = ShoeBox([6, 5, 3], fs=FS, max_order=25, absorption=absorption)
        room.add_microphone_array(np.array([[3.0, 2.0, 1.5]]).T)
        room.add_source([1.0, 1.0, 1.5], signal=np.ones(10))
        rt = float(np.mean(room.measure_rt60()))
        rts.append(rt)
        assert 0.02 < rt < 2.5
    assert rts[1] < rts[0]


def test_simulate_premix_shapes(rng):
    room = ShoeBox([5, 4, 3], fs=FS, max_order=8, absorption=0.4)
    mics = np.array([[2.0, 2.0, 1.5], [2.1, 2.0, 1.5]])
    room.add_microphone_array(mics.T)
    room.add_source([1.0, 1.0, 1.5], rng.standard_normal(FS // 4))
    room.add_source([4.0, 3.0, 1.5], rng.standard_normal(FS // 4))
    premix = room.simulate(return_premix=True)
    assert premix.shape[0] == 2 and premix.shape[1] == 2
    assert np.abs(premix).max() > 0


def test_jax_rir_matches_numpy():
    from sound_bubble_tpu.datagen.ism import compute_rirs_jax
    src = np.array([1.5, 2.0, 1.2])
    mics = np.array([[3.0, 2.0, 1.5], [3.2, 2.1, 1.4]])
    imgs, refl = shoebox_images([5, 4, 3], src, 6)
    rir_len = 3000
    np_rirs = np.stack([compute_rir(imgs, refl, m, FS, rir_len, 0.4)
                        for m in mics])
    jx = np.asarray(compute_rirs_jax(imgs, refl, mics, FS, rir_len, 0.4))
    # different interpolation (band-limited circular vs windowed sinc):
    # compare energy envelopes, not samples
    for i in range(2):
        e_np = np.cumsum(np_rirs[i] ** 2)
        e_jx = np.cumsum(jx[i] ** 2)
        np.testing.assert_allclose(e_jx[-1], e_np[-1], rtol=0.05)
        peak_np, peak_jx = np.argmax(np.abs(np_rirs[i])), np.argmax(np.abs(jx[i]))
        assert abs(int(peak_np) - int(peak_jx)) <= 1


def test_snr_rescale_exact(rng):
    near = [rng.standard_normal((6, 8000)) * 0.3]
    far = [rng.standard_normal((6, 8000)) * 0.5,
           rng.standard_normal((6, 8000)) * 0.2]
    target = -3.7
    achieved, far_scaled = rescale_mixture_to_target_snr(near, far, near,
                                                         target)
    assert achieved == target
    mixture = near[0] + sum(far_scaled)
    measured = snr_at_reference(mixture, near)
    assert abs(measured - target) < 1e-3


def test_generate_sample_end_to_end(rng, tmp_path):
    from sound_bubble_tpu.datagen.generate import generate_sample
    np.random.seed(3)
    clips = [(rng.standard_normal(FS // 2).astype(np.float64), f"spk{i}")
             for i in range(3)]
    for a, _ in clips:
        a /= np.abs(a).max()
    out = generate_sample(clips, None, 1, output_dir=str(tmp_path / "00000"),
                          sr=FS, duration=0.5, n_out_range=(2, 2),
                          dis_threshold=1.0, snr_range=(-5, 5),
                          max_order_range=(6, 12))
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["n_in"] == 1 and meta["n_out"] == 2
    assert meta["voice00"]["dis"] <= 1.0
    assert meta["voice01"]["dis"] > 1.0
    assert len([k for k in meta if k.startswith("mic")]) == 6
    assert 0.0 < meta["room_info"]["rt60"] < 2.5
    # sample dir loads through the dataset layer and the SNR matches metadata
    from sound_bubble_tpu.data.audio_io import read_audio_file
    mixture = read_audio_file(os.path.join(out, "mixture.wav"))
    gt = read_audio_file(os.path.join(out, "mic00_voice00.wav"))
    assert mixture.shape[0] == 6
    measured = snr_at_reference(mixture.astype(np.float64), [gt.astype(np.float64)])
    assert abs(measured - meta["input_snr"]) < 0.1  # PCM16 quantization slack
