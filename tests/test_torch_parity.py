"""Torch-oracle parity for conv building blocks (torch CPU is a test oracle
only, never a runtime dependency)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_causal_conv2d_matches_torch(rng):
    """CausalConv2d == torch Conv2d(ks=(3,3), padding=(0,1)) on the
    state-concatenated input (reference conv semantics)."""
    from sound_bubble_tpu.models.tfgridnet.model import CausalConv2d
    B, T, F, Cin, Cout = 2, 5, 9, 4, 6
    x = rng.standard_normal((B, T + 2, F, Cin)).astype(np.float32)
    layer = CausalConv2d(Cout)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])   # [3,3,Cin,Cout]
    b = np.asarray(variables["params"]["bias"])
    ours = np.asarray(layer.apply(variables, jnp.asarray(x)))

    tconv = torch.nn.Conv2d(Cin, Cout, (3, 3), padding=(0, 1))
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(b))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW (C, T, F)
        want = tconv(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_causal_deconv2d_matches_torch(rng):
    """CausalDeconv2d == torch ConvTranspose2d(ks=(3,3), padding=(2,1)) on
    the buffered input (reference deconv, `tfgridnet_causal.py:401`)."""
    from sound_bubble_tpu.models.tfgridnet.model import CausalDeconv2d
    B, T, F, Cin, Cout = 1, 4, 7, 5, 2
    x = rng.standard_normal((B, T + 2, F, Cin)).astype(np.float32)
    layer = CausalDeconv2d(Cout)
    variables = layer.init(jax.random.PRNGKey(1), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])   # [3,3,Cin,Cout]
    b = np.asarray(variables["params"]["bias"])
    ours = np.asarray(layer.apply(variables, jnp.asarray(x)))

    tconv = torch.nn.ConvTranspose2d(Cin, Cout, (3, 3), padding=(2, 1))
    with torch.no_grad():
        # torch ConvTranspose weight [in, out, kh, kw]; ours is stored as the
        # transposed-conv kernel in HWIO
        tconv.weight.copy_(torch.from_numpy(w.transpose(2, 3, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(b))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = tconv(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_dis_embed_film_matches_torch_math(rng):
    """DisEmbed (Linear no-bias -> reshape -> LayerNorm) + FiLM vs a direct
    torch transcription of `Dis_Embed_Conv`/`FilmLayer`."""
    from sound_bubble_tpu.models.tfgridnet.model import (
        DisEmbed, FiLM, NetConfig,
    )
    cfg = NetConfig(stft_chunk_size=32, stft_pad_size=16, dis_type="conv3",
                    D=8)
    F = cfg.n_freqs
    onehot = np.asarray([[0, 1, 0]], np.float32)
    de = DisEmbed(cfg)
    v = de.init(jax.random.PRNGKey(0), jnp.asarray(onehot))
    ours = np.asarray(de.apply(v, jnp.asarray(onehot)))  # [1, F, 4]

    wp = np.asarray(v["params"]["proj"]["kernel"])       # [3, F*4]
    g = np.asarray(v["params"]["norm"]["scale"])
    beta = np.asarray(v["params"]["norm"]["bias"])
    with torch.no_grad():
        e = torch.from_numpy(onehot) @ torch.from_numpy(wp)
        e = e.view(1, F, 4)
        e = torch.nn.functional.layer_norm(e, (4,), torch.from_numpy(g),
                                           torch.from_numpy(beta))
    np.testing.assert_allclose(ours, e.numpy(), atol=1e-5)

    film = FiLM(cfg.D)
    x = rng.standard_normal((1, 3, F, cfg.D)).astype(np.float32)
    vf = film.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(ours))
    got = np.asarray(film.apply(vf, jnp.asarray(x), jnp.asarray(ours)))
    wk = np.asarray(vf["params"]["weight"]["kernel"])
    wb = np.asarray(vf["params"]["weight"]["bias"])
    bk = np.asarray(vf["params"]["bias"]["kernel"])
    bb = np.asarray(vf["params"]["bias"]["bias"])
    w = ours @ wk + wb                                   # [1, F, D]
    bia = ours @ bk + bb
    want = x * w[:, None] + bia[:, None]
    np.testing.assert_allclose(got, want, atol=1e-5)
