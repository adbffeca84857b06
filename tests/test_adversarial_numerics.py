"""Adversarial numerics: RANDOMIZED shapes/configs against torch oracles and
against the streaming≡offline invariant.

The fixed-shape parity tests (test_rnn.py, test_torch_parity.py) pin the
common configurations; this sweep draws odd shapes (non-multiples of vector
widths, tiny dims, stride edge cases) from a seeded generator so layout or
boundary bugs that happen to cancel at the production shape still fail CI.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sound_bubble_tpu.ops.rnn import blstm, lstm


def _torch_lstm_params(tl, direction=""):
    w_ih = tl.__getattr__(f"weight_ih_l0{direction}").detach().numpy().T
    w_hh = tl.__getattr__(f"weight_hh_l0{direction}").detach().numpy().T
    b = (tl.__getattr__(f"bias_ih_l0{direction}")
         + tl.__getattr__(f"bias_hh_l0{direction}")).detach().numpy()
    return {"w_ih": jnp.asarray(w_ih), "w_hh": jnp.asarray(w_hh),
            "b": jnp.asarray(b)}


@pytest.mark.parametrize("seed", range(6))
def test_lstm_random_shapes_vs_torch(seed):
    rng = np.random.default_rng(100 + seed)
    B = int(rng.integers(1, 5))
    T = int(rng.integers(1, 24))
    C = int(rng.integers(1, 40))
    H = int(rng.integers(1, 48))
    bidir = bool(rng.integers(0, 2))
    torch.manual_seed(seed)
    tl = torch.nn.LSTM(C, H, 1, batch_first=True, bidirectional=bidir)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    with torch.no_grad():
        yt, _ = tl(torch.from_numpy(x))
    if bidir:
        p = {"fwd": _torch_lstm_params(tl),
             "bwd": _torch_lstm_params(tl, "_reverse")}
        y = blstm(p, jnp.asarray(x))
    else:
        y, _ = lstm(_torch_lstm_params(tl), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=2e-5)


@pytest.mark.parametrize("seed", range(4))
def test_causal_conv_random_shapes_vs_torch(seed):
    from sound_bubble_tpu.models.tfgridnet.model import (
        CausalConv2d, CausalDeconv2d,
    )
    rng = np.random.default_rng(200 + seed)
    B = int(rng.integers(1, 3))
    T = int(rng.integers(1, 6))
    F = int(rng.integers(3, 17))
    Cin = int(rng.integers(1, 9))
    Cout = int(rng.integers(1, 9))
    x = rng.standard_normal((B, T + 2, F, Cin)).astype(np.float32)

    layer = CausalConv2d(Cout)
    variables = layer.init(jax.random.PRNGKey(seed), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])
    b = np.asarray(variables["params"]["bias"])
    ours = np.asarray(layer.apply(variables, jnp.asarray(x)))
    tconv = torch.nn.Conv2d(Cin, Cout, (3, 3), padding=(0, 1))
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(b))
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, atol=1e-5)

    # deconv on the same draw (reference ConvTranspose2d(k=3, padding=(2,1)))
    layer = CausalDeconv2d(Cout)
    variables = layer.init(jax.random.PRNGKey(seed + 50), jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])
    b = np.asarray(variables["params"]["bias"])
    ours = np.asarray(layer.apply(variables, jnp.asarray(x)))
    tdec = torch.nn.ConvTranspose2d(Cin, Cout, (3, 3), padding=(2, 1))
    with torch.no_grad():
        tdec.weight.copy_(torch.from_numpy(w.transpose(2, 3, 0, 1)))
        tdec.bias.copy_(torch.from_numpy(b))
        want = tdec(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, atol=1e-5)


def _random_netconfig(rng):
    """A random (but valid) production-model configuration."""
    d_over_l = int(rng.integers(1, 4)) * 2      # D must divide by L
    L = int(rng.choice([1, 2, 4]))
    D = max(L * d_over_l, 4)
    cfg = dict(
        stft_chunk_size=int(rng.choice([16, 32])),
        stft_pad_size=int(rng.choice([8, 16])),
        stft_back_pad=int(rng.choice([0, 8])),
        num_ch=6,
        D=D,
        B=int(rng.integers(1, 4)),
        H=int(rng.integers(4, 17)),
        L=L,
        E=int(rng.integers(1, 4)),
        use_attn=bool(rng.integers(0, 2)),
        local_atten_len=int(rng.integers(2, 7)),
        chunk_causal=True,
        use_first_ln=bool(rng.integers(0, 2)),
        merge_method=str(rng.choice(["early_cat", "None"])),
        conv_lstm=bool(rng.integers(0, 2)),
        lstm_down=int(rng.choice([2, 4, 5])),
        dis_type=str(rng.choice(["linear1", "linear2", "conv2", "conv3"])),
        directional=bool(rng.integers(0, 2)),
        spectral_masking=bool(rng.integers(0, 2)),
    )
    return cfg


@pytest.mark.parametrize("seed", range(4))
def test_random_config_streaming_equals_offline(seed):
    """Any valid NetConfig draw must keep the core streaming invariant:
    chunked inference with carried state == one offline call (reference
    `edge/causal_infer.py:75-87` semantics)."""
    from sound_bubble_tpu.models.tfgridnet.model import make_net
    from sound_bubble_tpu.runtime.streaming import (
        ModelWrapper, streaming_inference,
    )
    rng = np.random.default_rng(300 + seed)
    params_dict = _random_netconfig(rng)
    conditional = bool(rng.integers(0, 2))
    net = make_net(params_dict, conditional=conditional)
    cfg = net.cfg
    P = cfg.stft_pad_size + cfg.stft_back_pad
    x = rng.standard_normal(
        (1, 6, cfg.stft_chunk_size * 7 + P)).astype(np.float32) * 3
    inputs = {"mixture": jnp.asarray(x[..., :cfg.n_fft])}
    dis = jnp.asarray([[0.0, 1.0, 0.0]])
    if conditional:
        inputs["dis_embed"] = dis
    params = net.init(jax.random.PRNGKey(seed), inputs)["params"]

    # offline: ONE call over the whole pre-padded signal (pad=False path)
    full = np.asarray(ModelWrapper(net, params).feed(jnp.asarray(x), dis))
    stream = np.asarray(streaming_inference(
        ModelWrapper(net, params), x, cfg.stft_chunk_size, P,
        dis_embed=dis))
    assert full.shape == stream.shape
    np.testing.assert_allclose(stream, full, atol=2e-4,
                               err_msg=f"config: {params_dict}")
