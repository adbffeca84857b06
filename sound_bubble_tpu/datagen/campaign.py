"""On-device training campaign data: TPU-synthesized RIR pool + streaming
batches that never touch the host.

The reference renders 30k clips offline with pyroomacoustics and re-reads
them for 200 epochs (`/root/reference/syn_experiments/pretrain_stage.json`,
`generate_adaptive_dataset.py:426-526`). On a 1-core host that pipeline
starves the chip, so the TPU-native campaign path is:

1. `build_pool` — scenario GEOMETRY on host (cheap numpy: rooms, head-array
   poses, bubble-constrained speaker placement — the exact reference
   distributions via datagen.generate), then all RIRs synthesized ON DEVICE
   by `rirs_on_device`: the image-source sum evaluated in the frequency
   domain (H[f] = sum_i a_i e^{-j w tau_i}, chunked over images) — the exact
   band-limited form of the Allen&Berkley sinc RIR in datagen.ism.
2. `make_batch` — one jitted function from (PRNG key, scenario indices) to a
   training batch: speech-like sources synthesized on device, RIR convolution
   via fft_conv, per-source peak scaling U(0.5,0.9), exact-SNR mixing with
   the reference quadratic (near_error=0 closed form), clip renorm — i.e.
   `generate_sample` semantics (datagen/generate.py:272-339) minus disk.

Training consumes fresh sources/SNRs every step over a fixed pool of room
acoustics; the whole per-step data path lives in HBM (the host only sends a
key and B int32 indices).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from sound_bubble_tpu.datagen.generate import (
    MIC_HEIGHT, get_random_mic_positions_headphone,
    get_random_speaker_positions_dis_uniform,
)
from sound_bubble_tpu.datagen.ism import FDL, shoebox_images
from sound_bubble_tpu.ops.fft_conv import fft_conv

S_MAX = 4          # source slots per scenario (<=2 in-bubble + <=2 outside)
RADII = (1.0, 1.5, 2.0)
DIS_EMBEDS = {1.0: (0.0, 0.0, 1.0), 1.5: (0.0, 1.0, 0.0), 2.0: (1.0, 0.0, 0.0)}
# background-noise slot (reference `generate_adaptive_dataset.py` renders
# n_BG in {0,1} WHAM! clips far-field in a HUGE second room, order 15,
# trimming the first 2000 samples of propagation — generate.py:224-240 is
# this repo's host mirror). 6 of the reference's 9 shipped goldens carry
# n_BG=1, so training without a noise term is a distribution gap.
BG_ORDER = 15      # reference room2 max_order
BG_TRIM = 2000     # samples dropped from the BG premix (reference `[2000:]`)


# ------------------------------------------------------------- host side ----

def sample_scenario(rng: np.random.Generator, radius: float, n_in: int,
                    max_order: int, n_img_max: int, bg_noise: bool = False):
    """One scenario's geometry (reference `generate_sample`
    distributions): returns dict of fixed-shape numpy arrays.

    bg_noise adds one LAST slot: a far-field background-noise source in a
    huge second room (reference `generate_data_scenario` room2 semantics —
    dims U(30,40) x U(50,60) x U(10,20), same absorption, order 15, source
    ~20-60 m out, first 2000 samples of propagation trimmed). The slot's
    signal (colored noise) and its on/off gate are drawn at batch time in
    `make_batch`."""
    np.random.seed(int(rng.integers(0, 2 ** 31 - 1)))  # generate.py uses np.random
    right = np.random.uniform(5, 8)
    top = np.random.uniform(4, 8)
    ceiling = np.random.uniform(2, 4)
    n_out = int(np.random.randint(1, 3))

    mic_center, _angle, mics = get_random_mic_positions_headphone(
        6, 0.0, right, 0.0, top)
    positions, dis = get_random_speaker_positions_dis_uniform(
        radius, n_in, n_out, mic_center, 0.0, right, top, 0.0)
    positions = np.array([
        list(p) + [np.random.uniform(MIC_HEIGHT - 0.25, MIC_HEIGHT + 0.25)]
        for p in positions])
    absorption = np.random.uniform(0.1, 0.9)

    S = S_MAX + 1 if bg_noise else S_MAX
    images = np.zeros((S, n_img_max, 3), np.float32)
    n_refl = np.zeros((S, n_img_max), np.float32)
    img_mask = np.zeros((S, n_img_max), np.float32)
    for s, pos in enumerate(positions):
        im, nr = shoebox_images([right, top, ceiling], pos, max_order)
        k = min(len(im), n_img_max)
        images[s, :k] = im[:k]
        n_refl[s, :k] = nr[:k]
        img_mask[s, :k] = 1.0

    active = np.zeros(S, np.float32)
    near = np.zeros(S, np.float32)
    noise_mask = np.zeros(S, np.float32)
    delay_trim = np.zeros(S, np.float32)
    active[:n_in + n_out] = 1.0
    near[:n_in] = 1.0
    if bg_noise:
        dims2 = [np.random.uniform(30, 40), np.random.uniform(50, 60),
                 np.random.uniform(10, 20)]
        bg = [np.random.uniform(15, dims2[0] - 2),
              np.random.uniform(20, dims2[1] - 2),
              np.random.uniform(3, dims2[2] - 2)]
        im, nr = shoebox_images(dims2, bg, BG_ORDER)
        k = min(len(im), n_img_max)
        images[S_MAX, :k] = im[:k]
        n_refl[S_MAX, :k] = nr[:k]
        img_mask[S_MAX, :k] = 1.0
        active[S_MAX] = 1.0          # gated per batch in make_batch
        noise_mask[S_MAX] = 1.0
        delay_trim[S_MAX] = BG_TRIM
    return dict(
        images=images, n_refl=n_refl, img_mask=img_mask,
        mics=mics.astype(np.float32),
        rho=np.float32(np.sqrt(1.0 - absorption)),
        active=active, near_mask=near, noise_mask=noise_mask,
        delay_trim=delay_trim,
        dis_embed=np.asarray(DIS_EMBEDS[radius], np.float32),
        radius=np.float32(radius),
    )


# --------------------------------------------------- device RIR synthesis ----

@functools.lru_cache(maxsize=4)
def _sinc_window_response(rir_len: int, oversample: int = 16) -> np.ndarray:
    """Spectrum (real, even prototype) of the host ISM's Hann-windowed-sinc
    fractional-delay filter (`ism.compute_rir`), sampled at the rir rfft
    grid — multiplying the ideal band-limited image sum by this makes the
    device RIRs match the host windowed-sinc RIRs."""
    half = FDL // 2
    u = np.arange(-(half + 1) * oversample, (half + 1) * oversample + 1) \
        / oversample
    w = 0.5 * (1 + np.cos(np.pi * u / (half + 1)))
    h = np.sinc(u) * np.clip(w, 0.0, None)
    nf = rir_len // 2 + 1
    f = np.arange(nf) / rir_len                      # cycles/sample
    resp = (h[None, :] * np.cos(2 * np.pi * f[:, None] * u[None, :])).sum(1) \
        / oversample
    return resp.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("fs", "rir_len", "chunk"))
def rirs_on_device(images, n_refl, img_mask, mics, rho, *,
                   fs: int, rir_len: int, chunk: int = 2048,
                   c: float = 343.0, delay_trim=None):
    """Image-source RIRs in the frequency domain, chunked over images.

    images [S, N, 3], n_refl/img_mask [S, N], mics [M, 3], rho scalar ->
    rirs [S, M, rir_len].  H[m, f] = sum_i a_i exp(-j 2 pi f tau_i) with
    a_i = rho^n_i / (4 pi d_i); images whose delay would wrap past rir_len
    are masked out (exact band-limited analog of `ism.compute_rir`).
    """
    S, N, _ = images.shape
    M = mics.shape[0]
    nf = rir_len // 2 + 1
    freqs = jnp.arange(nf, dtype=jnp.float32) * (2 * jnp.pi * fs / rir_len)
    pad = (-N) % chunk
    images = jnp.pad(images, ((0, 0), (0, pad), (0, 0)))
    n_refl = jnp.pad(n_refl, ((0, 0), (0, pad)))
    img_mask = jnp.pad(img_mask, ((0, 0), (0, pad)))
    n_chunks = images.shape[1] // chunk

    def body(i, acc):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk, 1)
        im, nr, mk = sl(images), sl(n_refl), sl(img_mask)
        d = jnp.linalg.norm(im[:, None] - mics[None, :, None], axis=-1)
        d = jnp.maximum(d, 1e-3)                      # [S, M, chunk]
        tau = d / c
        amp = (rho ** nr)[:, None] / (4 * jnp.pi * d) * mk[:, None]
        if delay_trim is not None:
            tau = tau - jnp.asarray(delay_trim)[:, None, None] / fs
            amp = jnp.where(tau >= 0, amp, 0.0)
        amp = jnp.where(tau * fs < rir_len - FDL, amp, 0.0)
        phase = tau[..., None] * freqs                # [S, M, chunk, F]
        re = jnp.sum(amp[..., None] * jnp.cos(phase), axis=2)
        im_ = jnp.sum(amp[..., None] * jnp.sin(phase), axis=2)
        return acc[0] + re, acc[1] - im_

    re, im = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.zeros((S, M, nf), jnp.float32), jnp.zeros((S, M, nf), jnp.float32)))
    w = jnp.asarray(_sinc_window_response(rir_len))
    return jnp.fft.irfft((re + 1j * im) * w, n=rir_len, axis=-1)


def rirs_host_fast(images, n_refl, img_mask, mics, rho, *, fs: int,
                   rir_len: int, oversample: int = 8,
                   c: float = 343.0, delay_trim=None) -> np.ndarray:
    """Fast host ISM synthesis: each image is one impulse scattered onto an
    `oversample`x grid (np.bincount — C-speed), then one rfft band-select
    brings it to the target rate with the same windowed-sinc prototype
    response as `rirs_on_device`. ~30x cheaper than per-image 81-tap sincs
    (`ism.compute_rir`); delay quantization is 1/oversample sample (phase
    error < 12 deg at 3 kHz for 8x), amplitudes/decay exact.

    images [S, N, 3], n_refl/img_mask [S, N], mics [M, 3] -> [S, M, rir_len].
    """
    S, N, _ = images.shape
    M = mics.shape[0]
    L8 = rir_len * oversample
    nf = rir_len // 2 + 1
    w = _sinc_window_response(rir_len)
    out = np.empty((S, M, rir_len), np.float32)
    images = np.asarray(images, np.float64)
    for s in range(S):
        d = np.linalg.norm(images[s][None, :, :] - np.asarray(mics)[:, None, :],
                           axis=-1)                        # [M, N]
        d = np.maximum(d, 1e-3)
        amp = (float(rho) ** np.asarray(n_refl[s])[None]) / (4 * np.pi * d)
        amp = amp * np.asarray(img_mask[s])[None]
        delay = d / c * fs
        if delay_trim is not None:
            # per-slot propagation trim (BG-noise slot: the reference drops
            # the first BG_TRIM samples of the room2 premix)
            delay = delay - float(delay_trim[s])
            amp = np.where(delay >= 0, amp, 0.0)
        amp = np.where(delay < rir_len - FDL, amp, 0.0)
        d8 = delay * oversample
        di = np.floor(d8).astype(np.int64)
        frac = (d8 - di).astype(np.float64)
        di = np.clip(di, 0, L8 - 2)
        for m in range(M):
            # linear-interp split over two adjacent grid samples: phase is
            # (near-)exact across the selected band, amplitude dip <2%
            idx = np.concatenate([di[m], di[m] + 1])
            wts = np.concatenate([amp[m] * (1 - frac[m]), amp[m] * frac[m]])
            grid = np.bincount(idx, weights=wts, minlength=L8)
            spec = np.fft.rfft(grid)[:nf] * w
            out[s, m] = np.fft.irfft(spec, n=rir_len).astype(np.float32)
    return out


def build_pool(n_scenarios: int, *, seed: int = 0, sr: int = 24000,
               rir_len: int = 12000, order_range=(10, 32),
               radii=RADII, method: str = "host", dtype=jnp.float32,
               to_device: bool = True, verbose: bool = True,
               bg_noise: bool = False):
    """Build the campaign pool: host geometry, RIRs via `method`
    ('host' = rirs_host_fast bincount+FFT, 'device' = rirs_on_device).

    Returns a dict of DEVICE arrays:
    rirs [P, S, 6, rir_len], active/near_mask [P, S], dis_embed [P, 3]
    (+ host list `radius` [P]); S = S_MAX, or S_MAX+1 with `bg_noise`
    (last slot = far-field background-noise RIR + `noise_mask` [P, S])."""
    rng = np.random.default_rng(seed)
    n_img_max = len(shoebox_images([6, 6, 3], [3, 3, 1.5],
                                   max(order_range[1], BG_ORDER))[0])
    rirs, active, near, dis, radius, noise = [], [], [], [], [], []
    for i in range(n_scenarios):
        r = radii[i % len(radii)]
        n_in = int(rng.integers(0, 3))
        order = int(rng.integers(order_range[0], order_range[1] + 1))
        sc = sample_scenario(rng, r, n_in, order, n_img_max,
                             bg_noise=bg_noise)
        if method == "host":
            out = rirs_host_fast(
                sc["images"], sc["n_refl"], sc["img_mask"], sc["mics"],
                sc["rho"], fs=sr, rir_len=rir_len,
                delay_trim=sc["delay_trim"] if bg_noise else None)
        else:
            out = rirs_on_device(
                jnp.asarray(sc["images"]), jnp.asarray(sc["n_refl"]),
                jnp.asarray(sc["img_mask"]), jnp.asarray(sc["mics"]),
                jnp.asarray(sc["rho"]), fs=sr, rir_len=rir_len,
                delay_trim=(jnp.asarray(sc["delay_trim"]) if bg_noise
                            else None))
        rirs.append(np.asarray(out))
        active.append(sc["active"])
        near.append(sc["near_mask"])
        noise.append(sc["noise_mask"])
        dis.append(sc["dis_embed"])
        radius.append(float(sc["radius"]))
        if verbose and (i + 1) % 100 == 0:
            print(f"pool: {i + 1}/{n_scenarios} scenarios", flush=True)
    # bf16 storage halves HBM and host->device transfer (0.4% tap error,
    # inaudible; the SNR scaling stays exact because it is computed from the
    # rendered signals); cast on HOST so the upload is already half-width.
    stack = np.stack(rirs)
    if dtype != jnp.float32:
        import ml_dtypes
        stack = stack.astype(ml_dtypes.bfloat16)
    pool = {
        "rirs": stack,
        "active": np.stack(active),
        "near_mask": np.stack(near),
        "dis_embed": np.stack(dis),
    }
    if bg_noise:
        pool["noise_mask"] = np.stack(noise)
    if to_device:
        pool = {k: jnp.asarray(v) for k, v in pool.items()}
    return pool, np.asarray(radius)


# -------------------------------------------------- device voice synthesis ----

def speechlike_voices(key, batch_shape, n: int, sr: int) -> jnp.ndarray:
    """Batched speech-like sources (same distributions as
    datasets/make_test_samples.speechlike, which builds the held-out eval
    sets): 5 harmonics on f0~U(110,220) with random amplitudes/phases, 2-5 Hz
    AM, pause gating, noise floor, random leading silence, peak-norm.

    Returns [*batch_shape, n] float32."""
    kf, ka, kp, km, kg, kgp, kz, kzs = jax.random.split(key, 8)
    bs = tuple(batch_shape)
    t = jnp.arange(n, dtype=jnp.float32) / sr
    f0 = jax.random.uniform(kf, bs + (1, 1), minval=110.0, maxval=220.0)
    harm = jnp.arange(1, 6, dtype=jnp.float32).reshape((1,) * len(bs) + (5, 1))
    amps = jax.random.uniform(ka, bs + (5, 1), minval=0.3, maxval=1.0) / harm
    phases = jax.random.uniform(kp, bs + (5, 1), minval=0.0, maxval=6.28)
    sig = jnp.sum(amps * jnp.sin(2 * jnp.pi * f0 * harm * t + phases), axis=-2)
    fm = jax.random.uniform(km, bs + (1,), minval=2.0, maxval=5.0)
    sig = sig * (1 + 0.8 * jnp.sin(2 * jnp.pi * fm * t))
    fg = jax.random.uniform(kg, bs + (1,), minval=0.3, maxval=0.7)
    pg = jax.random.uniform(kgp, bs + (1,), minval=0.0, maxval=6.28)
    env = (jnp.sin(2 * jnp.pi * fg * t + pg) > -0.7).astype(jnp.float32)
    sig = sig * env + 0.02 * jax.random.normal(kz, bs + (n,))
    # random leading silence (load_voice_clip's zero_front U(4000,64000)@48k
    # = U(0.083 s, 1.33 s)), capped at 40% of the clip so short clips keep
    # signal content
    lo = int(0.083 * sr)
    hi = max(int(min(1.33 * sr, 0.4 * n)), lo + 1)
    zs = jax.random.randint(kzs, bs + (1,), lo, hi)
    sig = jnp.where(jnp.arange(n) < zs, 0.0, sig)
    return sig / (jnp.max(jnp.abs(sig), axis=-1, keepdims=True) + 1e-9)


# ------------------------------------------------------- batch assembly ----

def radius_probs(dis_embed: np.ndarray, weights) -> np.ndarray:
    """Per-scenario sampling probabilities that re-weight the bubble radii.

    dis_embed: [P, 3] one-hot rows (DIS_EMBEDS layout: column 0 = 2.0 m,
    column 1 = 1.5 m, column 2 = 1.0 m). weights: 3 floats in RADII order
    (1.0, 1.5, 2.0). Returns [P] probabilities summing to 1, uniform WITHIN
    each radius class — so `rng.choice(P, p=...)` oversamples the weighted
    radii without biasing room/source geometry inside a class.
    """
    d = np.asarray(dis_embed, np.float32)
    cls = 2 - np.argmax(d, axis=1)          # column -> index into RADII
    w = np.asarray(list(weights), np.float64)
    if w.shape != (3,) or (w < 0).any() or w.sum() <= 0:
        raise ValueError(f"radius_weights must be 3 nonnegative floats: {weights}")
    counts = np.bincount(cls, minlength=3).astype(np.float64)
    if ((w > 0) & (counts == 0)).any():
        raise ValueError("pool has no scenarios for a radius with weight > 0")
    per_class = np.where(counts > 0, w / np.maximum(counts, 1), 0.0)
    p = per_class[cls]
    return p / p.sum()


def scenario_probs(pool, radius_weights=None, nin_weights=None) -> np.ndarray:
    """Joint radius x in-bubble-speaker-count reweighting (round-5 overlap
    curriculum, VERDICT r4 #2).

    The reference trains on exact 0/1/2-in-bubble thirds
    (`generate_adaptive_dataset.py:835-841` splits the sample index range
    into thirds by speaker count); this generalizes `radius_probs` so a
    campaign can OVERSAMPLE the diagnosed weak regimes — dense 2-in-bubble
    overlap and the empty-bubble mute case — without touching geometry.

    radius_weights: 3 floats in RADII order (1.0, 1.5, 2.0 m) or None.
    nin_weights: 3 floats for n_in = 0/1/2 in-bubble speakers or None.
    Returns [P] probabilities; the total mass of joint class (r, n) is
    proportional to w_r[r] * w_n[n], uniform WITHIN each joint class.
    """
    d = np.asarray(pool["dis_embed"], np.float32)
    cls_r = 2 - np.argmax(d, axis=1)                    # -> index into RADII
    nin = np.rint(np.asarray(pool["near_mask"], np.float32).sum(1)).astype(int)
    if (nin < 0).any() or (nin > 2).any():
        raise ValueError("near_mask rows must sum to 0/1/2 speakers")

    def _w(weights, name):
        if weights is None:
            return None
        w = np.asarray(list(weights), np.float64)
        if w.shape != (3,) or (w < 0).any() or w.sum() <= 0:
            raise ValueError(f"{name} must be 3 nonnegative floats: {weights}")
        return w

    wr = _w(radius_weights, "radius_weights")
    wn = _w(nin_weights, "nin_weights")
    # a None dimension is COLLAPSED (all scenarios share one class along
    # it), so radius-only input reproduces radius_probs exactly — the mass
    # within a radius class stays uniform regardless of its n_in makeup
    cr = cls_r if wr is not None else np.zeros_like(cls_r)
    cn = nin if wn is not None else np.zeros_like(nin)
    wr_eff = wr if wr is not None else np.ones(3)
    wn_eff = wn if wn is not None else np.ones(3)
    joint = cr * 3 + cn
    counts = np.bincount(joint, minlength=9).astype(np.float64)
    w = np.outer(wr_eff, wn_eff).reshape(9)
    for r in (range(3) if wr is not None else (0,)):
        for n_ in (range(3) if wn is not None else (0,)):
            if w[r * 3 + n_] > 0 and counts[r * 3 + n_] == 0:
                raise ValueError(
                    "pool has no scenarios for a weighted (radius, n_in) "
                    "class; enlarge the pool or zero that weight")
    per_class = np.where(counts > 0, w / np.maximum(counts, 1), 0.0)
    p = per_class[joint]
    return p / p.sum()


def make_batch(key, pool, idx, *, n_samples: int, sr: int = 24000,
               snr_range=(-10.0, 5.0), voice: str = "formant",
               bg_noise_p: float = 0.0, dense2_p: float = 0.0):
    """One training batch from the pool, fully on device.

    idx: [B] int32 scenario indices. Returns (inputs, targets) with
    inputs {mixture [B,6,T], dis_embed [B,3]}, targets {target [B,1,T]}.
    voice: "formant" (Klatt-style glottal-pulse + formant sources,
    datagen.voice) or "harmonic" (the round-2 5-harmonic quasi-speech).
    bg_noise_p: probability a sample carries far-field background noise in
    the pool's noise slot (requires a `bg_noise=True` pool; the reference
    draws n_BG in {0,1} — `generate_adaptive_dataset.py`, and 6/9 shipped
    goldens have n_BG=1). The noise is amplitude-modulated colored noise
    (beta~U(0,2)) through the huge-room RIR, peak-scaled U(0.05,0.4) like
    the reference's BG (generate.py:233-235) instead of the speakers'
    U(0.5,0.9); it joins the `far` sum, so the exact-SNR solve counts it
    exactly as the reference's `rescale_mixture_to_target_snr` does.
    dense2_p: probability that a 2-in-bubble sample gets the DENSE-OVERLAP
    treatment (round-5 curriculum): both in-bubble talkers are formant
    voices with pause probability 0.05 (near-continuous speech), leading
    silence capped at 0.12 s, and F0 bases drawn within +-2 semitones of a
    shared center — the close-F0 / high-temporal-overlap regime the
    goldens dissection showed the model mutes wholesale. Requires
    voice in ("formant", "mix").
    """
    bg = bg_noise_p > 0.0 and "noise_mask" in pool
    kv, kp, ks = jax.random.split(key, 3)
    rirs = pool["rirs"][idx].astype(jnp.float32)   # [B, S, M, L]
    active = pool["active"][idx]           # [B, S]
    near_mask = pool["near_mask"][idx]
    b, s = active.shape
    if not bg and "noise_mask" in pool:
        # bg pool driven with bg_noise_p=0: silence the noise slot instead
        # of letting it render as a fifth far SPEAKER through the room2 RIR
        active = active * (1.0 - pool["noise_mask"][idx])
    if bg:
        kv, kb, kg = jax.random.split(kv, 3)

    s_v = s - 1 if bg else s               # speech slots
    dense_kw, dm = {}, None
    if dense2_p > 0.0:
        if voice not in ("formant", "mix"):
            raise ValueError("dense2_p needs voice='formant' or 'mix'")
        kv, kd1, kd2, kd3 = jax.random.split(kv, 4)
        two_in = jnp.sum(near_mask, axis=1) >= 2.0
        dense = jnp.logical_and(
            two_in, jax.random.bernoulli(kd1, dense2_p, (b,)))
        # in-bubble sources always occupy the FIRST slots (sample_scenario
        # sets near[:n_in] = 1), so the pair mask is slots {0, 1}
        dm = dense[:, None] & (jnp.arange(s_v) < 2)[None, :]   # [b, s_v]
        f0c = jax.random.uniform(kd2, (b, 1), minval=105.0, maxval=215.0)
        f0_pair = f0c * 2.0 ** jax.random.uniform(
            kd3, (b, 2), minval=-2.0 / 12, maxval=2.0 / 12)
        f0_full = jnp.pad(f0_pair, ((0, 0), (0, s_v - 2)),
                          constant_values=-1.0)
        default_hi = float(max(int(min(1.33 * sr, 0.4 * n_samples)),
                               int(0.083 * sr) + 1))
        dense_kw = dict(
            pause_p=jnp.where(dm, 0.05, 0.20),
            sil_hi=jnp.where(dm, 0.12 * sr, default_hi),
            f0_base=jnp.where(dm, f0_full, -1.0))
    if voice == "formant":
        from sound_bubble_tpu.datagen.voice import formant_voices
        voices = formant_voices(kv, (b, s_v), n_samples, sr, **dense_kw)
    elif voice == "mix":
        # broadened source statistics: 75% Klatt-style formant voices,
        # 25% harmonic quasi-speech, drawn per source — widens the timbre
        # distribution the separator sees so suppression decisions rely on
        # SPATIAL cues rather than the formant synthesizer's signature
        from sound_bubble_tpu.datagen.voice import formant_voices
        kv1, kv2, kc = jax.random.split(kv, 3)
        pick = jax.random.bernoulli(kc, 0.75, (b, s_v))
        if dm is not None:
            pick = jnp.logical_or(pick, dm)   # dense pairs are always formant
        voices = jnp.where(pick[:, :, None],
                           formant_voices(kv1, (b, s_v), n_samples, sr,
                                          **dense_kw),
                           speechlike_voices(kv2, (b, s_v), n_samples, sr))
    else:
        voices = speechlike_voices(kv, (b, s_v), n_samples, sr)
    if bg:
        # colored noise (beta~U(0,2): white..brown, the reference's WHAM!
        # ambience proxy in-image) with a slow random AM envelope
        from sound_bubble_tpu.ops.noise import colored_noise_traced
        kb1, kb2, kb3, kb4 = jax.random.split(kb, 4)
        beta = jax.random.uniform(kb1, (b,), minval=0.0, maxval=2.0)
        noise = colored_noise_traced(kb2, beta, n_samples)       # [B, T]
        t = jnp.arange(n_samples, dtype=jnp.float32) / sr
        depth = jax.random.uniform(kb3, (b, 1), maxval=0.5)
        fm = jax.random.uniform(kb4, (b, 2), minval=0.1, maxval=1.0)
        env = 1.0 - depth * (0.5 + 0.5 * jnp.sin(
            2 * jnp.pi * fm[:, :1] * t[None] + 2 * jnp.pi * fm[:, 1:]))
        voices = jnp.concatenate([voices, (noise * env)[:, None]], axis=1)
        # n_BG ~ Bernoulli(p): gate the noise slot per sample
        gate = jax.random.bernoulli(kg, bg_noise_p, (b, 1)).astype(
            active.dtype)
        active = jnp.concatenate([active[:, :-1], active[:, -1:] * gate], 1)
    premix = fft_conv(voices[:, :, None, :], rirs,
                      mode="full")[..., :n_samples]   # [B, S, M, T]
    # per-source peak scaling U(0.5,0.9) (reference `:476-487`); the BG
    # slot scales U(0.05,0.4) (reference room2 premix scaling, :233-235)
    u = jax.random.uniform(kp, (b, s, 1, 1))
    if bg:
        lo = jnp.asarray([0.5] * s_v + [0.05]).reshape(1, s, 1, 1)
        hi = jnp.asarray([0.9] * s_v + [0.4]).reshape(1, s, 1, 1)
    else:
        lo, hi = 0.5, 0.9
    scale = lo + u * (hi - lo)
    peak = jnp.max(jnp.abs(premix), axis=(-2, -1), keepdims=True)
    premix = premix / (peak + 1e-9) * scale
    premix = premix * active[:, :, None, None]

    near = jnp.sum(premix * near_mask[:, :, None, None], axis=1)  # [B, M, T]
    far = jnp.sum(premix * ((active - near_mask))[:, :, None, None], axis=1)

    # exact-SNR far scaling (reference quadratic with near_error=0); empty
    # bubble (near==0) keeps the far mix unscaled like `generate_sample`.
    target_snr = jax.random.uniform(ks, (b,), minval=snr_range[0],
                                    maxval=snr_range[1])
    near_pwr = jnp.sum(near[:, 0] ** 2, -1)
    far_pwr = jnp.sum(far[:, 0] ** 2, -1)
    k = jnp.sqrt(near_pwr / (10 ** (target_snr / 10)) / (far_pwr + 1e-9))
    k = jnp.where(near_pwr > 0, k, 1.0)
    mixture = near + k[:, None, None] * far
    gt = near[:, 0:1]

    # clip renorm (reference `generate_sample:323-326`)
    div = jnp.maximum(jnp.max(jnp.abs(mixture), axis=(-2, -1), keepdims=True),
                      1.0)
    inputs = {"mixture": mixture / div, "dis_embed": pool["dis_embed"][idx]}
    targets = {"target": gt / div}
    return inputs, targets
