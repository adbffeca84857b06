"""TF-GridNet model tests: the reference's de-facto unit tests made real.

Covers (SURVEY.md §4): chunk-length invariance (`dis_embd3/net.py:95-141`),
streaming == offline equivalence (`edge/causal_infer.py:75-87`), state pytree
structure, and the attention / conv_lstm / unconditioned variants.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_bubble_tpu.models.tfgridnet.model import (
    Net, NetConfig, init_state, make_net,
)

SMALL = dict(stft_chunk_size=32, stft_pad_size=16, num_ch=4, D=8, B=2, H=8,
             L=2, E=2, use_attn=False, chunk_causal=True, use_first_ln=True,
             merge_method="early_cat", conv_lstm=False, dis_type="conv3")


def _make(params, conditional=True):
    net = make_net(params, conditional=conditional)
    cfg = net.cfg
    rng = np.random.default_rng(0)
    n = cfg.stft_chunk_size * 12
    x = jnp.asarray(rng.standard_normal((2, cfg.num_ch, n)).astype(np.float32))
    inputs = {"mixture": x, "dis_embed": jnp.asarray([[0., 0., 1.], [0., 1., 0.]])}
    variables = net.init(jax.random.PRNGKey(0), inputs)
    return net, variables, inputs, cfg


def _stream(net, variables, inputs, cfg):
    """Feed chunk-by-chunk with a rolling (chunk+pad) window, threading state
    (mirrors `edge/causal_infer.streaming_inference`; the signal must be
    n_chunks*T + P samples long)."""
    x = inputs["mixture"]
    T = cfg.stft_chunk_size
    P = cfg.stft_pad_size + cfg.stft_back_pad  # window = [back | chunk | front]
    state = init_state(cfg, x.shape[0])
    window = jnp.zeros((x.shape[0], x.shape[1], T + P), x.dtype)
    window = window.at[..., -P:].set(x[..., :P]) if P else window
    step = jax.jit(lambda v, i, s: net.apply(v, i, s, pad=False))
    outs = []
    for i in range(P, x.shape[-1] - T + 1, T):
        window = jnp.roll(window, -T, axis=-1).at[..., -T:].set(x[..., i:i + T])
        out = step(variables, {**inputs, "mixture": window}, state)
        outs.append(out["output"])
        state = out["next_state"]
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("variant", ["base", "attn", "conv_lstm", "uncond",
                                     "masking", "back_pad"])
def test_streaming_equals_offline(variant):
    params = dict(SMALL)
    conditional = True
    if variant == "attn":
        params.update(use_attn=True, local_atten_len=5)
    elif variant == "conv_lstm":
        params.update(conv_lstm=True, lstm_down=4)
    elif variant == "uncond":
        conditional = False
    elif variant == "masking":
        params.update(spectral_masking=True)
    elif variant == "back_pad":
        # look_back>0 exercises the reference causal_decoder path
        # (`tfgridnet_causal.py:423-431`)
        params.update(stft_back_pad=16)
    net, variables, inputs, cfg = _make(params, conditional)
    # offline: one call over a pre-padded signal (pad=False path)
    x = inputs["mixture"]
    P = cfg.stft_pad_size + cfg.stft_back_pad
    n_chunks = (x.shape[-1] - P) // cfg.stft_chunk_size
    inputs = {**inputs,
              "mixture": x[..., :n_chunks * cfg.stft_chunk_size + P]}
    y_off = net.apply(variables, inputs, pad=False)["output"]
    y_str = _stream(net, variables, inputs, cfg)
    assert y_off.shape == y_str.shape
    np.testing.assert_allclose(np.asarray(y_str), np.asarray(y_off), atol=1e-4)


def test_chunk_length_invariance():
    """Prefix outputs must be identical regardless of total length (causality;
    reference `net.py:119-136`)."""
    net, variables, inputs, cfg = _make(dict(SMALL))
    x = inputs["mixture"]  # 12 chunks; treat trailing pad-size as lookahead
    y_full = net.apply(variables, inputs, pad=False)["output"]
    n = cfg.stft_chunk_size * 5
    short = {**inputs, "mixture": x[..., :n + cfg.stft_pad_size]}
    y_short = net.apply(variables, short, pad=False)["output"]
    np.testing.assert_allclose(np.asarray(y_short[..., :n]),
                               np.asarray(y_full[..., :n]), atol=1e-4)


def test_output_shape_and_state_keys():
    net, variables, inputs, cfg = _make(dict(SMALL))
    out = net.apply(variables, inputs)
    assert out["output"].shape == (2, 1, inputs["mixture"].shape[-1])
    st = out["next_state"]
    assert set(st) == {"conv_buf", "deconv_buf", "istft_buf", "gridnet_bufs"}
    assert set(st["gridnet_bufs"]) == {"buf0", "buf1"}
    assert set(st["gridnet_bufs"]["buf0"]) == {"h0", "c0"}


def test_mod_pad_trim():
    """Non-multiple input lengths give same-length outputs (mod trim)."""
    net, variables, inputs, cfg = _make(dict(SMALL))
    x = inputs["mixture"][..., :cfg.stft_chunk_size * 4 + 7]
    y = net.apply(variables, {**inputs, "mixture": x})["output"]
    assert y.shape[-1] == x.shape[-1]


def test_production_param_count():
    """Production config must land in the reference's 0.3-0.5M band
    (README.md:13)."""
    prod = dict(stft_chunk_size=192, stft_pad_size=96, num_ch=6, D=32, L=4,
                B=6, H=64, E=2, local_atten_len=100, use_attn=False,
                lookahead=True, chunk_causal=True, use_first_ln=True,
                merge_method="early_cat", conv_lstm=False, dis_type="conv3")
    net = make_net(prod)
    x = jnp.zeros((1, 6, 192 * 2))
    inputs = {"mixture": x, "dis_embed": jnp.zeros((1, 3))}
    variables = net.init(jax.random.PRNGKey(0), inputs)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 250_000 <= n <= 550_000, f"param count {n} out of reference band"
