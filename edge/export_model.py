"""Export a trained run for edge deployment + conformance fixtures.

TPU-native equivalent of `/root/reference/edge/to_onnx.py`:

  python edge/export_model.py --run_dir runs/MYRUN --out_dir models

Produces:
  models/ONNX/model.onnx  (self-contained, jaxpr-lowered — the reference's
                           primary interchange format, runtime/onnx_export.py)
  models/StableHLO/model.stablehlo (+ .meta.json)
  models/TFLite/model.tflite
  models/native/weights.bin + model_config.json
  models/test_data/replication_test/*.npy   (named single-step fixtures)
  models/test_data/streaming_test/e2e_*.npy (whole-signal fixtures)
and verifies jax vs ONNX (in-image numpy evaluator) vs TFLite outputs
(allclose 1e-4) with a timing loop.
"""
import argparse
import json
import os
import time

import numpy as np

from sound_bubble_tpu.utils import ensure_platform as _ensure_platform


def main(args):
    _ensure_platform()
    import jax
    import jax.numpy as jnp

    import sound_bubble_tpu.utils as utils
    from sound_bubble_tpu.runtime.export import (
        dump_replication_fixtures, export_stablehlo, export_tflite,
        export_weights_blob, load_inputs, make_flat_step,
    )
    from sound_bubble_tpu.runtime.streaming import (
        ModelWrapper, streaming_inference,
    )

    module = utils.load_torch_pretrained(args.run_dir)
    net, params = module.net, module.params
    cfg = net.cfg
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print("Number of parameters:", n_params / 1e6, "M")

    out = args.out_dir
    from sound_bubble_tpu.runtime.onnx_export import export_onnx
    onnx_path = export_onnx(net, params,
                            os.path.join(out, "ONNX", "model.onnx"))
    print("[INFO] Converted to onnx!")
    export_stablehlo(net, params,
                     os.path.join(out, "StableHLO", "model.stablehlo"))
    print("[INFO] Exported StableHLO")
    export_weights_blob(params, os.path.join(out, "native", "weights.bin"))
    if args.quantize:
        export_weights_blob(params,
                            os.path.join(out, "native", "weights_int8.bin"),
                            quantize=True)
        print("[INFO] Exported int8 native weights blob")
    with open(os.path.join(out, "native", "model_config.json"), "w") as f:
        json.dump({k: getattr(cfg, k) for k in
                   ("stft_chunk_size", "stft_pad_size", "stft_back_pad",
                    "num_ch", "D", "B", "H", "L", "E", "use_attn",
                    "local_atten_len", "conv_lstm", "lstm_down",
                    "use_first_ln", "merge_method", "directional",
                    "dis_type", "num_src", "conditional")},
                  f, indent=2)
    print("[INFO] Exported native weights blob")

    tflite_path = None
    if not args.skip_tflite:
        tflite_path = export_tflite(
            net, params, os.path.join(out, "TFLite", "model.tflite"))
        print("[INFO] Exported TFLite")
        if args.quantize:
            export_tflite(net, params,
                          os.path.join(out, "TFLite", "model_int8.tflite"),
                          quantize=True)
            print("[INFO] Exported dynamic-range quantized TFLite")

    fix_dir = os.path.join(out, "test_data", "replication_test")
    dump_replication_fixtures(net, params, fix_dir)
    print("[INFO] Dumped replication fixtures")

    # conformance + timing: jax step vs TFLite on the same fixtures
    fn, names, bufs0, _ = make_flat_step(net, params)
    mixture, in_names, buffers = load_inputs(fix_dir)
    jfn = jax.jit(fn)
    ref = jfn(jnp.asarray(mixture), *[jnp.asarray(b) for b in buffers])
    t1 = time.time()
    for _ in range(args.runs):
        y = jfn(jnp.asarray(mixture), *[jnp.asarray(b) for b in buffers])
    jax.block_until_ready(y)
    print("JAX TIMES:", (time.time() - t1) / args.runs)

    gold = np.load(os.path.join(fix_dir, "filtered_output.npy"))
    assert np.allclose(np.asarray(ref[0]), gold, atol=1e-5)

    from sound_bubble_tpu.runtime.onnx_eval import OnnxEvaluator
    ev = OnnxEvaluator(onnx_path)
    feeds = {"mixture": mixture}
    feeds.update({n: b for n, b in zip(names, buffers)})
    onnx_out = ev.run(feeds)["filtered_output"]
    print("jax vs ONNX allclose:",
          np.allclose(onnx_out, np.asarray(ref[0]), atol=1e-4))

    if tflite_path:
        import tensorflow as tf
        interp = tf.lite.Interpreter(model_path=tflite_path)
        interp.allocate_tensors()
        inputs = [mixture] + buffers
        in_det = interp.get_input_details()
        for d, v in zip(in_det, inputs):
            interp.set_tensor(d["index"], v.astype(np.float32))
        t1 = time.time()
        for _ in range(args.runs):
            interp.invoke()
        print("TFLITE TIMES:", (time.time() - t1) / args.runs)
        out0 = interp.get_tensor(interp.get_output_details()[0]["index"])
        print("jax vs TFLite allclose:",
              np.allclose(out0, np.asarray(ref[0]), atol=1e-4))

    # end-to-end streaming fixtures
    print("Creating arrays to run end-to-end streaming test")
    np.random.seed(0)
    X = np.random.randn(1, cfg.num_ch,
                        cfg.stft_chunk_size * 15 + cfg.stft_pad_size) \
        .astype(np.float32) * 10
    full = np.asarray(ModelWrapper(net, params).feed(X))
    stream = np.asarray(streaming_inference(
        ModelWrapper(net, params), X, cfg.stft_chunk_size, cfg.stft_pad_size))
    sdir = os.path.join(out, "test_data", "streaming_test")
    os.makedirs(sdir, exist_ok=True)
    np.save(os.path.join(sdir, "e2e_input_X.npy"), X)
    np.save(os.path.join(sdir, "e2e_output_streaming.npy"), stream)
    np.save(os.path.join(sdir, "e2e_output_full.npy"), full)
    print("Test successful:", np.allclose(stream, full, atol=1e-3))
    print("Max diff:", np.max(np.abs(stream - full)))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--out_dir", default="models")
    p.add_argument("--runs", type=int, default=100)
    p.add_argument("--skip_tflite", action="store_true")
    p.add_argument("--quantize", action="store_true",
                   help="also export int8 weight-quantized artifacts "
                        "(reference edge/to_onnx.py:150-160 analog)")
    main(p.parse_args())
