"""On-device campaign datagen: RIR parity with the host ISM, batch semantics
(exact SNR, empty-bubble zero target, clip renorm)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sound_bubble_tpu.datagen import campaign
from sound_bubble_tpu.datagen.ism import ShoeBox, shoebox_images


def test_device_rir_matches_host_ism():
    """Frequency-domain device RIR == host windowed-sinc RIR (both are the
    band-limited image-source sum; tolerance covers the 81-tap window)."""
    room = [5.0, 4.0, 3.0]
    src = [2.0, 1.5, 1.4]
    mics = np.array([[1.0, 2.0, 1.5], [1.2, 2.1, 1.5]], np.float32)
    # rir_len covers every image (max path (order+1)*diag ~ 64 m -> 4452
    # samples) so host tap truncation at the boundary doesn't enter
    fs, rir_len, order, absorption = 24000, 8192, 8, 0.4

    box = ShoeBox(p=room, fs=fs, max_order=order, absorption=absorption)
    box.add_microphone_array(mics.T)
    box.add_source(src, signal=np.zeros(10))
    host = np.stack([np.pad(r, (0, max(rir_len - len(r), 0)))[:rir_len]
                     for r in box.compute_rirs()[0]])

    images, n_refl = shoebox_images(room, src, order)
    n = len(images)
    dev = campaign.rirs_on_device(
        jnp.asarray(images, jnp.float32)[None],
        jnp.asarray(n_refl, jnp.float32)[None],
        jnp.ones((1, n), jnp.float32),
        jnp.asarray(mics),
        jnp.float32(np.sqrt(1 - absorption)),
        fs=fs, rir_len=rir_len, chunk=512)
    dev = np.asarray(dev[0])

    assert dev.shape == host.shape
    # Delays, amplitudes and decay agree; the residual is the host
    # windowed-sinc interpolator's own aliasing (its window is not
    # band-limited), which only perturbs sidelobe microstructure.
    err = np.linalg.norm(dev - host) / np.linalg.norm(host)
    assert err < 0.06, f"relative RIR error {err}"
    # physical agreement: total energy <1% and Schroeder decay <0.2 dB
    e_dev, e_host = np.sum(dev ** 2, -1), np.sum(host ** 2, -1)
    assert np.abs(e_dev / e_host - 1).max() < 0.01
    edc_dev = np.cumsum((dev ** 2)[:, ::-1], -1)[:, ::-1]
    edc_host = np.cumsum((host ** 2)[:, ::-1], -1)[:, ::-1]
    # compare down to -20 dB of the host decay; deeper, the ideal-band-limited
    # synthesis keeps a (physically irrelevant) leakage floor the truncated
    # host sinc does not
    span = edc_host > 1e-2 * edc_host[:, :1]
    db = 10 * np.abs(np.log10(edc_dev[span] / edc_host[span]))
    assert db.max() < 0.2, f"EDC divergence {db.max()} dB"


def test_pool_and_batch_semantics():
    pool, radius = campaign.build_pool(
        6, seed=0, sr=8000, rir_len=1024, order_range=(3, 6), verbose=False)
    assert pool["rirs"].shape[:2] == (6, campaign.S_MAX)
    assert pool["dis_embed"].shape == (6, 3)
    # radii cycle 1 / 1.5 / 2
    assert list(radius[:3]) == [1.0, 1.5, 2.0]

    idx = jnp.arange(6)
    inputs, targets = campaign.make_batch(
        jax.random.PRNGKey(0), pool, idx, n_samples=8000, sr=8000)
    mix = np.asarray(inputs["mixture"])
    gt = np.asarray(targets["target"])
    assert mix.shape == (6, 6, 8000) and gt.shape == (6, 1, 8000)
    assert np.isfinite(mix).all() and np.abs(mix).max() <= 1.0 + 1e-5

    near_count = np.asarray(pool["near_mask"]).sum(1)
    for i in range(6):
        if near_count[i] == 0:
            assert np.abs(gt[i]).max() == 0, "empty bubble must have zero gt"
        else:
            assert np.abs(gt[i]).max() > 0

    # one-hot dis_embed rows
    de = np.asarray(inputs["dis_embed"])
    assert ((de.sum(1) == 1) & (de.max(1) == 1)).all()


def test_batch_snr_exact():
    """For positive non-clipped samples the reference-channel SNR equals the
    drawn target exactly (the quadratic closed form with near_error=0)."""
    pool, _ = campaign.build_pool(
        3, seed=1, sr=8000, rir_len=1024, order_range=(3, 5), verbose=False)
    # force one near + one far source so SNR is well-defined
    pool = dict(pool)
    pool["near_mask"] = jnp.asarray([[1, 0, 0, 0]] * 3, jnp.float32)
    pool["active"] = jnp.asarray([[1, 1, 0, 0]] * 3, jnp.float32)

    key = jax.random.PRNGKey(3)
    inputs, targets = campaign.make_batch(
        key, pool, jnp.arange(3), n_samples=8000, sr=8000,
        snr_range=(2.0, 2.0))  # pin the target SNR
    mix = np.asarray(inputs["mixture"])
    gt = np.asarray(targets["target"])
    for i in range(3):
        noise = mix[i, 0] - gt[i, 0]
        snr = 10 * np.log10(np.sum(gt[i, 0] ** 2)
                            / (np.sum(noise ** 2) + 1e-12))
        assert abs(snr - 2.0) < 1e-2, f"sample {i}: snr {snr}"


def test_mix_voice_batch():
    """voice='mix' (75/25 formant/harmonic per source) renders a finite,
    normalized batch through the same jitted path."""
    pool, _ = campaign.build_pool(
        4, seed=1, sr=8000, rir_len=1024, order_range=(3, 6), verbose=False)
    inputs, targets = campaign.make_batch(
        jax.random.PRNGKey(2), pool, jnp.arange(4), n_samples=8000, sr=8000,
        voice="mix")
    mix = np.asarray(inputs["mixture"])
    assert mix.shape == (4, 6, 8000)
    assert np.isfinite(mix).all() and np.abs(mix).max() <= 1.0 + 1e-5
    assert np.isfinite(np.asarray(targets["target"])).all()


def test_voices_speechlike_stats():
    v = np.asarray(campaign.speechlike_voices(
        jax.random.PRNGKey(0), (4, 2), 16000, 8000))
    assert v.shape == (4, 2, 16000)
    peaks = np.abs(v).max(-1)
    assert np.allclose(peaks, 1.0, atol=1e-3)
    # leading silence present (>= 0.083 s)
    assert (np.abs(v[..., :600]).max(-1) < 1e-6).all()


def test_host_fast_rir_matches_device():
    """The bincount+FFT host path and the on-device frequency-domain path
    are the same synthesis up to delay quantization (1/8 sample)."""
    import time
    from sound_bubble_tpu.datagen.ism import shoebox_images as sbi
    room, src = [5.0, 4.0, 3.0], [2.0, 1.5, 1.4]
    mics = np.array([[1.0, 2.0, 1.5], [1.2, 2.1, 1.5]], np.float32)
    images, n_refl = sbi(room, src, 10)
    n = len(images)
    args = (jnp.asarray(images, jnp.float32)[None],
            jnp.asarray(n_refl, jnp.float32)[None],
            jnp.ones((1, n), jnp.float32), jnp.asarray(mics),
            jnp.float32(np.sqrt(0.6)))
    dev = np.asarray(campaign.rirs_on_device(
        *args, fs=24000, rir_len=8192, chunk=512)[0])
    host = campaign.rirs_host_fast(
        np.asarray(images, np.float32)[None], np.asarray(n_refl)[None],
        np.ones((1, n), np.float32), mics, np.sqrt(0.6),
        fs=24000, rir_len=8192)[0]
    err = np.linalg.norm(host - dev) / np.linalg.norm(dev)
    assert err < 0.02, f"host-fast vs device error {err}"


def test_bg_noise_pool_and_batch():
    """bg_noise pools carry one extra far-field noise slot (reference
    `generate_adaptive_dataset.py` n_BG semantics: huge room2, order 15,
    first 2000 samples trimmed, peak scale U(0.05,0.4)); the slot joins the
    `far` sum so the exact-SNR solve still lands on the drawn target."""
    pool, _ = campaign.build_pool(
        3, seed=2, sr=8000, rir_len=2048, order_range=(3, 5), verbose=False,
        bg_noise=True)
    S = campaign.S_MAX + 1
    assert pool["rirs"].shape[:2] == (3, S)
    nm = np.asarray(pool["noise_mask"])
    assert (nm[:, -1] == 1).all() and (nm[:, :-1] == 0).all()
    # the trimmed huge-room RIR still lands energy inside the window
    assert np.abs(np.asarray(pool["rirs"][:, -1])).max() > 0

    # force 1 near + 1 far speaker; noise always on -> SNR exactness must
    # hold with the noise counted inside `far`
    pool = dict(pool)
    pool["near_mask"] = jnp.asarray([[1, 0, 0, 0, 0]] * 3, jnp.float32)
    pool["active"] = jnp.asarray([[1, 1, 0, 0, 1]] * 3, jnp.float32)
    inputs, targets = campaign.make_batch(
        jax.random.PRNGKey(5), pool, jnp.arange(3), n_samples=8000, sr=8000,
        snr_range=(2.0, 2.0), bg_noise_p=1.0)
    mix = np.asarray(inputs["mixture"])
    gt = np.asarray(targets["target"])
    assert np.isfinite(mix).all() and np.abs(mix).max() <= 1.0 + 1e-5
    for i in range(3):
        noise = mix[i, 0] - gt[i, 0]
        snr = 10 * np.log10(np.sum(gt[i, 0] ** 2)
                            / (np.sum(noise ** 2) + 1e-12))
        assert abs(snr - 2.0) < 1e-2, f"sample {i}: snr {snr}"

    # noise-only sample (no speakers): mixture is pure BG noise, zero gt
    pool["near_mask"] = jnp.zeros((3, 5), jnp.float32)
    pool["active"] = jnp.asarray([[0, 0, 0, 0, 1]] * 3, jnp.float32)
    inputs, targets = campaign.make_batch(
        jax.random.PRNGKey(6), pool, jnp.arange(3), n_samples=8000, sr=8000,
        bg_noise_p=1.0)
    assert np.abs(np.asarray(targets["target"])).max() == 0
    assert np.abs(np.asarray(inputs["mixture"])).max() > 1e-4

    # gate off (p -> 0 would disable the branch; use the mask): an all-off
    # gate run is covered by bg_noise_p=0.0 falling back to the legacy path
    inputs0, _ = campaign.make_batch(
        jax.random.PRNGKey(6), pool, jnp.arange(3), n_samples=8000, sr=8000,
        bg_noise_p=0.0)
    # legacy path ignores the noise slot's signal: with no speakers active
    # in slots 0..3 the mixture is silent
    assert np.abs(np.asarray(inputs0["mixture"])).max() <= 1e-6


def test_radius_probs_reweighting():
    """--radius_weights sampling distribution: per-class mass follows the
    weights, uniform within a class, errors on bad input."""
    import numpy as np
    from sound_bubble_tpu.datagen.campaign import DIS_EMBEDS, radius_probs

    # pool of 7 scenarios cycling 1.0/1.5/2.0 like build_pool (3/2/2 split)
    radii = [1.0, 1.5, 2.0, 1.0, 1.5, 2.0, 1.0]
    dis = np.asarray([DIS_EMBEDS[r] for r in radii], np.float32)

    p = radius_probs(dis, (1.0, 1.0, 2.0))
    assert p.shape == (7,) and abs(p.sum() - 1.0) < 1e-9
    mass = {r: p[[i for i, rr in enumerate(radii) if rr == r]].sum()
            for r in (1.0, 1.5, 2.0)}
    assert abs(mass[1.0] - 0.25) < 1e-9
    assert abs(mass[1.5] - 0.25) < 1e-9
    assert abs(mass[2.0] - 0.50) < 1e-9
    # uniform within a class despite unequal class sizes
    ones = [p[i] for i, r in enumerate(radii) if r == 1.0]
    assert max(ones) - min(ones) < 1e-12

    # uniform weights == uniform over the pool only for equal class counts;
    # here class 1.0 has 3 members so each gets (1/3)/3
    pu = radius_probs(dis, (1.0, 1.0, 1.0))
    assert abs(pu[0] - (1 / 3) / 3) < 1e-9 and abs(pu[1] - (1 / 3) / 2) < 1e-9

    import pytest
    with pytest.raises(ValueError):
        radius_probs(dis, (1.0, -1.0, 1.0))
    with pytest.raises(ValueError):
        radius_probs(dis[:1], (1.0, 1.0, 1.0))  # weight>0, class absent


def test_scenario_probs_joint_reweighting():
    """Joint radius x n_in reweighting (round-5 overlap curriculum): class
    mass proportional to w_r*w_n, uniform within a joint class, and the
    radius_weights-only path matches radius_probs exactly."""
    from sound_bubble_tpu.datagen.campaign import (
        DIS_EMBEDS, radius_probs, scenario_probs)

    radii = [1.0, 1.5, 2.0] * 4
    nins = [0, 1, 2, 2, 1, 0, 1, 2, 0, 2, 0, 1]   # each (r, n) class once+
    dis = np.asarray([DIS_EMBEDS[r] for r in radii], np.float32)
    near = np.zeros((12, 4), np.float32)
    for i, n in enumerate(nins):
        near[i, :n] = 1.0
    pool = {"dis_embed": dis, "near_mask": near}

    # radius-only degenerates to radius_probs
    p = scenario_probs(pool, radius_weights=(1.0, 1.0, 2.0))
    assert np.allclose(p, radius_probs(dis, (1.0, 1.0, 2.0)))

    # joint: mass of (r=2.0, n_in=2) doubles relative to (r=2.0, n_in=0)
    p = scenario_probs(pool, radius_weights=(1, 1, 2),
                       nin_weights=(1, 1, 2))
    assert abs(p.sum() - 1.0) < 1e-9
    m = {}
    for r in (1.0, 1.5, 2.0):
        for n in (0, 1, 2):
            sel = [i for i in range(12) if radii[i] == r and nins[i] == n]
            m[(r, n)] = p[sel].sum()
    assert abs(m[(2.0, 2)] / m[(2.0, 0)] - 2.0) < 1e-9
    assert abs(m[(2.0, 0)] / m[(1.0, 0)] - 2.0) < 1e-9
    assert abs(sum(m.values()) - 1.0) < 1e-9

    import pytest
    with pytest.raises(ValueError):
        scenario_probs(pool, nin_weights=(1.0, 1.0))      # wrong arity
    with pytest.raises(ValueError):
        # weight > 0 on an absent joint class
        scenario_probs({"dis_embed": dis[:1], "near_mask": near[:1]},
                       nin_weights=(1.0, 1.0, 1.0))


def test_dense2_curriculum_batch():
    """dense2_p=1: every 2-in-bubble sample's in-bubble pair is rendered
    dense (pause-starved, short leading silence, close F0) and the batch
    stays finite/normalized; 0/1-in-bubble samples are untouched by the
    mask construction."""
    pool, _ = campaign.build_pool(
        6, seed=3, sr=8000, rir_len=1024, order_range=(3, 5), verbose=False)
    # force known speaker counts: slots are [near..., far...]
    pool = dict(pool)
    pool["near_mask"] = jnp.asarray(
        [[1, 1, 0, 0]] * 3 + [[0, 0, 0, 0]] * 2 + [[1, 0, 0, 0]],
        jnp.float32)
    pool["active"] = jnp.asarray(
        [[1, 1, 1, 0]] * 3 + [[1, 1, 0, 0]] * 2 + [[1, 1, 0, 0]],
        jnp.float32)
    for voice in ("formant", "mix"):
        inputs, targets = campaign.make_batch(
            jax.random.PRNGKey(5), pool, jnp.arange(6), n_samples=8000,
            sr=8000, voice=voice, dense2_p=1.0)
        mix = np.asarray(inputs["mixture"])
        gt = np.asarray(targets["target"])
        assert np.isfinite(mix).all() and np.abs(mix).max() <= 1.0 + 1e-5
        assert (np.abs(gt[:3]).max(-1) > 0).all()
        assert np.abs(gt[3:5]).max() == 0

    import pytest
    with pytest.raises(ValueError):
        campaign.make_batch(jax.random.PRNGKey(0), pool, jnp.arange(6),
                            n_samples=8000, sr=8000, voice="harmonic",
                            dense2_p=0.5)


def test_dense_voice_knobs_overlap():
    """The per-voice knobs measurably raise temporal overlap: a dense pair
    (pause_p=0.05, sil_hi=0.12 s) has much higher joint-activity fraction
    than default talkers, and f0_base pins the talker's pitch."""
    from sound_bubble_tpu.datagen.voice import formant_voices

    n, sr = 24000, 8000
    k = jax.random.PRNGKey(7)
    dense = np.asarray(formant_voices(
        k, (8, 2), n, sr,
        pause_p=jnp.full((8, 2), 0.05),
        sil_hi=jnp.full((8, 2), 0.12 * sr),
        f0_base=jnp.full((8, 2), 150.0)))
    dflt = np.asarray(formant_voices(k, (8, 2), n, sr))

    def joint_active(v):
        # 10 ms frame energies; both voices active in the same frame
        e = (v.reshape(8, 2, -1, sr // 100) ** 2).mean(-1)
        act = e > 1e-4 * e.max(axis=-1, keepdims=True)
        return (act[:, 0] & act[:, 1]).mean()

    assert np.isfinite(dense).all() and np.isfinite(dflt).all()
    assert joint_active(dense) > joint_active(dflt) + 0.15, (
        joint_active(dense), joint_active(dflt))
