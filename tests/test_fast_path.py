"""Fused-stack fast path (Pallas, interpret mode on CPU): output parity with
the model's own forward, chunk by chunk with carried state."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_bubble_tpu.models.tfgridnet.model import make_net
from sound_bubble_tpu.runtime.fast_path import FusedStreamer, fused_scan_stream
from sound_bubble_tpu.runtime.streaming import ModelWrapper, streaming_inference

SMALL = dict(stft_chunk_size=32, stft_pad_size=16, num_ch=6, D=8, B=3, H=8,
             L=2, E=2, use_attn=False, chunk_causal=True, use_first_ln=True,
             merge_method="early_cat", conv_lstm=False, dis_type="conv3")


@pytest.mark.parametrize(
    "variant", ["cond", "uncond", "masking", "conv_lstm", "back_pad",
                "attn", "attn_conv", "attn_vmem", "attn_vmem_uncond",
                "attn_conv_vmem"])
def test_fused_matches_model(variant, rng):
    params_dict = dict(SMALL)
    conditional = variant not in ("uncond", "attn_vmem_uncond")
    attn_in_kernel = None
    if variant == "masking":
        params_dict.update(spectral_masking=True)
    elif variant == "conv_lstm":
        # raspberrypi/orangpi edge shape (VERDICT r2 weak #6,
        # `real_experiments/raspberrypi_model_pretrain.json:7-26`)
        params_dict.update(conv_lstm=True, lstm_down=5)
    elif variant == "back_pad":
        params_dict.update(stft_back_pad=8)
    elif variant == "attn":
        # per-block kernel + XLA attention hybrid; W smaller than the
        # 8-chunk stream so the K/V ring wraps mid-test
        params_dict.update(use_attn=True, local_atten_len=5)
        attn_in_kernel = False
    elif variant == "attn_conv":
        params_dict.update(use_attn=True, local_atten_len=5,
                           conv_lstm=True, lstm_down=2)
        attn_in_kernel = False
    elif variant == "attn_conv_vmem":
        params_dict.update(use_attn=True, local_atten_len=5,
                           conv_lstm=True, lstm_down=2)
        attn_in_kernel = True
    elif variant.startswith("attn_vmem"):
        # whole-stack kernel with the K/V rings in VMEM; W smaller than the
        # 8-chunk stream so the slot ring wraps (permutation-invariance of
        # the window softmax is what makes the ring exact)
        params_dict.update(use_attn=True, local_atten_len=5)
        attn_in_kernel = True
    net = make_net(params_dict, conditional=conditional)
    cfg = net.cfg
    x = rng.standard_normal(
        (1, 6, cfg.stft_back_pad + cfg.stft_chunk_size * 8
         + cfg.stft_pad_size)
    ).astype(np.float32) * 3
    inputs = {"mixture": jnp.asarray(x[..., :cfg.n_fft])}
    dis = jnp.asarray([[0.0, 1.0, 0.0]])
    if conditional:
        inputs["dis_embed"] = dis
    params = net.init(jax.random.PRNGKey(0), inputs)["params"]

    ref = np.asarray(streaming_inference(
        ModelWrapper(net, params), x, cfg.stft_chunk_size,
        cfg.stft_pad_size + cfg.stft_back_pad, dis_embed=dis))

    fs = FusedStreamer(net, params, dis_embed=dis, interpret=True,
                       attn_in_kernel=attn_in_kernel)
    T, P = cfg.stft_chunk_size, cfg.stft_pad_size + cfg.stft_back_pad
    window = np.zeros((1, 6, T + P), np.float32)
    window[..., -P:] = x[..., :P]
    outs = []
    for i in range(P, x.shape[-1] - T + 1, T):
        window = np.roll(window, -T, axis=-1)
        window[..., -T:] = x[..., i:i + T]
        outs.append(np.asarray(fs.feed(window)))
    got = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_scan_matches_feed_loop(rng):
    net = make_net(SMALL, conditional=True)
    cfg = net.cfg
    T, P = cfg.stft_chunk_size, cfg.stft_pad_size
    n_chunks = 5
    x = rng.standard_normal((1, 6, T * n_chunks + P)).astype(np.float32)
    inputs = {"mixture": jnp.asarray(x[..., :cfg.n_fft]),
              "dis_embed": jnp.asarray([[0.0, 0.0, 1.0]])}
    params = net.init(jax.random.PRNGKey(1), inputs)["params"]

    windows = np.stack([x[..., i * T:i * T + T + P]
                        for i in range(n_chunks)])
    got = np.asarray(fused_scan_stream(net, params, jnp.asarray(windows),
                                       interpret=True))
    ref = np.asarray(streaming_inference(
        ModelWrapper(net, params), x, T, P))
    np.testing.assert_allclose(got, ref, atol=1e-4)




@pytest.mark.parametrize("variant", ["cond", "conv_lstm"])
def test_streaming_scan_matches_loop(variant, rng):
    """The one-dispatch serving path (streaming_inference_scan, which traces
    its scan with the direction-fused BLSTM on — the measured TPU serving
    default) is numerically the python chunk loop."""
    from sound_bubble_tpu.ops import rnn as _rnn
    from sound_bubble_tpu.runtime.streaming import streaming_inference_scan

    params_dict = dict(SMALL)
    if variant == "conv_lstm":
        params_dict.update(conv_lstm=True, lstm_down=5)
    net = make_net(params_dict, conditional=True)
    cfg = net.cfg
    chunk, pad = cfg.stft_chunk_size, cfg.stft_pad_size
    x = rng.standard_normal((1, 6, pad + chunk * 6)).astype(np.float32) * 3
    dis = [[0.0, 1.0, 0.0]]
    variables = net.init(jax.random.PRNGKey(0),
                         {"mixture": jnp.asarray(x[..., :cfg.n_fft]),
                          "dis_embed": jnp.asarray(dis)})
    w = ModelWrapper(net, variables["params"])
    ref = np.asarray(streaming_inference(w, x, chunk, pad, dis_embed=dis))
    flag_before = _rnn._DIR_FUSE
    got = np.asarray(streaming_inference_scan(
        net, variables["params"], x, chunk, pad, dis_embed=dis))
    assert _rnn._DIR_FUSE == flag_before  # caller's flag restored
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)
