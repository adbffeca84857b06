"""Cross-runtime conformance at a LOOK-BACK config (VERDICT r2 #10).

Exports a small `stft_back_pad>0` model to every deployment artifact
(StableHLO, TFLite, native f32 + int8 weight blobs) and checks each
runtime's single-step output against the JAX-dumped gold fixture — pinning
the documented reference causal_decoder quirk
(`/root/reference/src/models/tfgridnet_realtime_clean_dis_embd3/tfgridnet_causal.py:423-431`)
in every runtime, not just the model forward.
"""
import importlib.util
import json
import os
import shutil
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "sbtpu_edge", "libsbtpu_edge.so")


def _load_check_runtime():
    spec = importlib.util.spec_from_file_location(
        "check_runtime", os.path.join(REPO, "edge", "check_runtime.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def exported_backpad_model(tmp_path_factory, request):
    from sound_bubble_tpu.models.tfgridnet.model import make_net
    from sound_bubble_tpu.runtime.export import (
        dump_replication_fixtures, export_stablehlo, export_tflite,
        export_weights_blob,
    )

    out = tmp_path_factory.mktemp("models_backpad")
    params_dict = dict(stft_chunk_size=32, stft_pad_size=16, stft_back_pad=8,
                       num_ch=6, D=8, B=2, H=8, L=2, E=2, use_attn=False,
                       chunk_causal=True, use_first_ln=True,
                       merge_method="early_cat", conv_lstm=False,
                       dis_type="conv3")
    net = make_net(params_dict, conditional=True)
    cfg = net.cfg
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 6, cfg.n_fft)).astype(np.float32))
    dis = jnp.asarray([[0.0, 0.0, 1.0]])
    params = net.init(jax.random.PRNGKey(0),
                      {"mixture": x, "dis_embed": dis})["params"]

    export_stablehlo(net, params,
                     str(out / "StableHLO" / "model.stablehlo"), dis_embed=dis)
    try:
        export_tflite(net, params, str(out / "TFLite" / "model.tflite"),
                      dis_embed=dis)
    except Exception as e:  # TF converter may be absent/broken in some envs
        print("TFLite export unavailable:", e)
    export_weights_blob(params, str(out / "native" / "weights.bin"))
    export_weights_blob(params, str(out / "native" / "weights_int8.bin"),
                        quantize=True)
    keys = ("stft_chunk_size", "stft_pad_size", "stft_back_pad", "num_ch",
            "D", "B", "H", "L", "E", "use_attn", "local_atten_len",
            "conv_lstm", "lstm_down", "use_first_ln", "merge_method",
            "directional", "dis_type", "num_src", "conditional")
    (out / "native" / "model_config.json").write_text(
        json.dumps({k: getattr(cfg, k) for k in keys}))
    dump_replication_fixtures(net, params,
                              str(out / "test_data" / "replication_test"),
                              dis_embed=dis)
    return out


def _fixture_io(mod, models_dir):
    from sound_bubble_tpu.runtime.export import load_inputs

    fix = os.path.join(models_dir, "test_data", "replication_test")
    mixture, names, buffers = load_inputs(fix)
    gold = np.load(os.path.join(fix, "filtered_output.npy"))
    return mixture, names, buffers, gold


def test_backpad_stablehlo_matches_gold(exported_backpad_model):
    mod = _load_check_runtime()
    mixture, names, buffers, gold = _fixture_io(mod,
                                                str(exported_backpad_model))
    y, _ = mod.eval_jax(str(exported_backpad_model), mixture, names, buffers)
    np.testing.assert_allclose(np.asarray(y), gold, atol=1e-5)


def test_backpad_tflite_matches_gold(exported_backpad_model):
    tflite = exported_backpad_model / "TFLite" / "model.tflite"
    if not tflite.exists():
        pytest.skip("TFLite export unavailable in this environment")
    mod = _load_check_runtime()
    mixture, names, buffers, gold = _fixture_io(mod,
                                                str(exported_backpad_model))
    y, _ = mod.eval_tflite(str(exported_backpad_model), mixture, names,
                           buffers)
    np.testing.assert_allclose(np.asarray(y), gold, atol=1e-4)


@pytest.mark.parametrize("weights,tol", [("weights.bin", 1e-4),
                                         ("weights_int8.bin", 5e-2)])
def test_backpad_native_matches_gold(exported_backpad_model, weights, tol):
    if not os.path.exists(LIB):
        if shutil.which("make") is None:
            pytest.skip("no C++ toolchain")
        subprocess.run(["make", "-C",
                        os.path.join(REPO, "native", "sbtpu_edge")],
                       check=True, capture_output=True)
    mod = _load_check_runtime()
    mixture, names, buffers, gold = _fixture_io(mod,
                                                str(exported_backpad_model))
    y, _ = mod.eval_native(str(exported_backpad_model), mixture, names,
                           buffers, weights=weights)
    if y is None:
        pytest.skip("native engine unavailable")
    np.testing.assert_allclose(np.asarray(y), gold, atol=tol)
