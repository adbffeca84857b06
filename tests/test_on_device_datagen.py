"""On-device (jit) batched mixing/augmentation pipeline tests."""
import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.datagen.on_device import (
    augment, make_training_batch, mix_to_target_snr, render_sources,
)


def test_mix_to_target_snr_exact(rng):
    near = jnp.asarray(rng.standard_normal((3, 6, 4000)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((3, 6, 4000)).astype(np.float32))
    target = jnp.asarray([-5.0, 0.0, 3.0])
    _, mixture = mix_to_target_snr(near, far, target)
    noise = np.asarray(mixture - near)[:, 0]
    achieved = 10 * np.log10(np.sum(np.asarray(near[:, 0]) ** 2, -1)
                             / np.sum(noise ** 2, -1))
    np.testing.assert_allclose(achieved, np.asarray(target), atol=1e-3)


def test_render_matches_scipy(rng):
    import scipy.signal
    voices = rng.standard_normal((1, 2, 500)).astype(np.float32)
    rirs = rng.standard_normal((1, 2, 3, 64)).astype(np.float32)
    out = np.asarray(render_sources(jnp.asarray(voices), jnp.asarray(rirs)))
    for s in range(2):
        for m in range(3):
            want = scipy.signal.fftconvolve(voices[0, s], rirs[0, s, m])[:500]
            np.testing.assert_allclose(out[0, s, m], want, atol=1e-4)


def test_full_batch_jits(rng):
    key = jax.random.PRNGKey(0)
    voices = jnp.asarray(rng.standard_normal((2, 3, 2000)).astype(np.float32))
    rirs = jnp.asarray(rng.standard_normal((2, 3, 6, 128)).astype(np.float32)
                       * 0.1)
    target = jnp.asarray([0.0, -3.0])
    fn = jax.jit(lambda k, v, r, t: make_training_batch(k, v, r, 1, t))
    inputs, targets = fn(key, voices, rirs, target)
    assert inputs["mixture"].shape == (2, 6, 2000)
    assert targets["target"].shape == (2, 1, 2000)
    assert np.isfinite(np.asarray(inputs["mixture"])).all()
    assert np.abs(np.asarray(inputs["mixture"])).max() <= 1.0 + 1e-5


def test_augment_gt_follows_reference_channel(rng):
    key = jax.random.PRNGKey(1)
    mixture = jnp.asarray(rng.standard_normal((1, 6, 1000)).astype(np.float32))
    gt = mixture[:, 0:1] * 0.5
    aug_mix, aug_gt = augment(key, mixture, gt, max_gain_db=6, max_shift=2,
                              noise_levels=(0.0, 0.0, 0.0))
    # gt must stay exactly 0.5x of (augmented, noise-free) reference channel
    np.testing.assert_allclose(np.asarray(aug_gt[:, 0]),
                               np.asarray(aug_mix[:, 0]) * 0.5, atol=1e-5)
