"""Native C++ engine conformance: builds libsbtpu_edge.so (if a toolchain is
present), exports a tiny model, and checks the 15-chunk streaming output
bit-matches the JAX model through the ctypes binding."""
import json
import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "sbtpu_edge", "libsbtpu_edge.so")


@pytest.fixture(scope="module")
def native_lib():
    if not os.path.exists(LIB):
        if shutil.which("g++") is None and shutil.which("make") is None:
            pytest.skip("no C++ toolchain")
        subprocess.run(["make", "-C", os.path.join(REPO, "native",
                                                   "sbtpu_edge")],
                       check=True, capture_output=True)
    return LIB


@pytest.mark.parametrize(
    "variant", ["plain", "conv_lstm", "uncond", "back_pad", "attn"])
def test_native_matches_jax(native_lib, tmp_path, variant, rng):
    import jax
    import jax.numpy as jnp

    from native.sbtpu_edge import NativeEngine
    from sound_bubble_tpu.models.tfgridnet.model import make_net
    from sound_bubble_tpu.runtime.export import export_weights_blob
    from sound_bubble_tpu.runtime.streaming import (
        ModelWrapper, streaming_inference,
    )

    params_dict = dict(stft_chunk_size=32, stft_pad_size=16, num_ch=6, D=8,
                       B=2, H=8, L=2, E=2, use_attn=False, chunk_causal=True,
                       use_first_ln=True, merge_method="early_cat",
                       conv_lstm=False, dis_type="conv3")
    conditional = True
    if variant == "conv_lstm":
        params_dict.update(conv_lstm=True, lstm_down=5)
    elif variant == "uncond":
        conditional = False
    elif variant == "back_pad":
        params_dict.update(stft_back_pad=16)
    elif variant == "attn":
        # W < n chunks so the K/V ring actually wraps during the stream
        params_dict.update(use_attn=True, local_atten_len=6)
    net = make_net(params_dict, conditional=conditional)
    cfg = net.cfg
    x = rng.standard_normal(
        (1, 6, cfg.stft_chunk_size * 10 + cfg.stft_pad_size
         + cfg.stft_back_pad)
    ).astype(np.float32) * 5
    inputs = {"mixture": jnp.asarray(x[..., :cfg.n_fft])}
    if conditional:
        inputs["dis_embed"] = jnp.asarray([[0.0, 0.0, 1.0]])
    params = net.init(jax.random.PRNGKey(0), inputs)["params"]

    model_dir = tmp_path / "native"
    model_dir.mkdir()
    export_weights_blob(params, str(model_dir / "weights.bin"))
    keys = ("stft_chunk_size", "stft_pad_size", "stft_back_pad", "num_ch",
            "D", "B", "H", "L", "E", "use_attn", "local_atten_len",
            "conv_lstm", "lstm_down", "use_first_ln", "merge_method",
            "directional", "dis_type", "num_src", "conditional")
    (model_dir / "model_config.json").write_text(
        json.dumps({k: getattr(cfg, k) for k in keys}))

    ref = np.asarray(streaming_inference(
        ModelWrapper(net, params), x, cfg.stft_chunk_size,
        cfg.stft_pad_size + cfg.stft_back_pad))
    eng = NativeEngine(str(model_dir))
    out = eng.stream(x[0])
    np.testing.assert_allclose(out, ref[0], atol=2e-5)


@pytest.mark.parametrize("variant", ["plain", "attn"])
def test_int8_quantized_blob_drift(native_lib, tmp_path, rng, variant):
    """int8 weight-only export (reference dynamic-quantization analog,
    `to_onnx.py:150-160`): the native engine must accept the SBTW0002 blob
    and its streaming output must stay close to the fp32 engine.

    The attn variant pins ADVICE r2 #1: attn_v.proj / attn_out_proj kernels
    hit the int8 pack condition and must route through the Tensor-aware
    mm() dispatcher (raw w.data is empty for packed tensors)."""
    import jax
    import jax.numpy as jnp

    from native.sbtpu_edge import NativeEngine
    from sound_bubble_tpu.models.tfgridnet.model import make_net
    from sound_bubble_tpu.runtime.export import export_weights_blob

    params_dict = dict(stft_chunk_size=32, stft_pad_size=16, num_ch=6, D=16,
                       B=2, H=16, L=2, E=2, use_attn=False, chunk_causal=True,
                       use_first_ln=True, merge_method="early_cat",
                       conv_lstm=False, dis_type="conv3")
    if variant == "attn":
        params_dict.update(use_attn=True, local_atten_len=6)
    net = make_net(params_dict, conditional=True)
    cfg = net.cfg
    x = rng.standard_normal(
        (1, 6, cfg.stft_chunk_size * 10 + cfg.stft_pad_size)
    ).astype(np.float32)
    inputs = {"mixture": jnp.asarray(x[..., :cfg.n_fft]),
              "dis_embed": jnp.asarray([[0.0, 0.0, 1.0]])}
    params = net.init(jax.random.PRNGKey(0), inputs)["params"]

    cfg_json = json.dumps({k: getattr(cfg, k) for k in (
        "stft_chunk_size", "stft_pad_size", "stft_back_pad", "num_ch", "D",
        "B", "H", "L", "E", "use_attn", "local_atten_len", "conv_lstm",
        "lstm_down", "use_first_ln", "merge_method", "directional",
        "dis_type", "num_src", "conditional")})
    outs = {}
    for tag, quant in (("f32", False), ("int8", True)):
        d = tmp_path / tag
        d.mkdir()
        export_weights_blob(params, str(d / "weights.bin"), quantize=quant)
        (d / "model_config.json").write_text(cfg_json)
        outs[tag] = NativeEngine(str(d)).stream(x[0])

    ref, q = outs["f32"], outs["int8"]
    # int8 blob is ~4x smaller on the big matrices
    drift = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
    corr = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
    assert drift < 0.15, f"relative drift {drift}"
    assert corr > 0.995, f"correlation {corr}"
    # the two artifacts differ (quantization actually happened)
    assert np.abs(q - ref).max() > 0
