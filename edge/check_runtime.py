"""Cross-runtime conformance + latency check on exported fixtures.

Mirrors `/root/reference/edge/check_runtime.py`: replays the replication
fixtures through every available runtime (JAX CPU step, StableHLO reload,
TFLite interpreter, native C++ engine) and prints ms-per-chunk + output
agreement — device correctness without the device in the loop.

  python edge/check_runtime.py --models_dir models
"""
import argparse
import os
import time

import numpy as np

from sound_bubble_tpu.utils import ensure_platform as _ensure_platform

RUNS = 10


def eval_jax(models_dir, mixture, names, buffers):
    import jax

    blob = open(os.path.join(models_dir, "StableHLO", "model.stablehlo"),
                "rb").read()
    fn = jax.export.deserialize(blob).call
    jfn = jax.jit(fn)
    y = jfn(mixture, *buffers)
    jax.block_until_ready(y)
    t1 = time.time()
    for _ in range(RUNS):
        y = jfn(mixture, *buffers)
    jax.block_until_ready(y)
    return np.asarray(y[0]), (time.time() - t1) / RUNS


def eval_tflite(models_dir, mixture, names, buffers):
    import tensorflow as tf

    path = os.path.join(models_dir, "TFLite", "model.tflite")
    if not os.path.exists(path):
        return None, None
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    for d, v in zip(interp.get_input_details(), [mixture] + buffers):
        interp.set_tensor(d["index"], v.astype(np.float32))
    interp.invoke()
    t1 = time.time()
    for _ in range(RUNS):
        interp.invoke()
    y = interp.get_tensor(interp.get_output_details()[0]["index"])
    return y, (time.time() - t1) / RUNS


def eval_onnx(models_dir, mixture, names, buffers):
    """ONNX artifact through the in-image numpy evaluator (the reference
    checks its export with onnxruntime, to_onnx.py:163-190; same role)."""
    from sound_bubble_tpu.runtime.onnx_eval import OnnxEvaluator

    path = os.path.join(models_dir, "ONNX", "model.onnx")
    if not os.path.exists(path):
        return None, None
    ev = OnnxEvaluator(path)
    feeds = {"mixture": mixture}
    feeds.update({n: b for n, b in zip(names, buffers)})
    y = ev.run(feeds)["filtered_output"]
    t1 = time.time()
    for _ in range(RUNS):
        y = ev.run(feeds)["filtered_output"]
    return y, (time.time() - t1) / RUNS


def eval_native(models_dir, mixture, names, buffers, weights="weights.bin"):
    """Native C++ engine via its ctypes binding (see native/)."""
    import shutil
    import tempfile
    try:
        from native.sbtpu_edge import NativeEngine
    except (ImportError, OSError):
        return None, None
    model_dir = os.path.join(models_dir, "native")
    if weights != "weights.bin":
        if not os.path.exists(os.path.join(model_dir, weights)):
            return None, None
        # the engine loads <dir>/weights.bin: stage the variant blob
        tmp = tempfile.mkdtemp()
        shutil.copy(os.path.join(model_dir, weights),
                    os.path.join(tmp, "weights.bin"))
        shutil.copy(os.path.join(model_dir, "model_config.json"), tmp)
        model_dir = tmp
    eng = NativeEngine(model_dir)
    y = eng.step(mixture, buffers)[0]
    t1 = time.time()
    for _ in range(RUNS):
        y = eng.step(mixture, buffers)[0]
    return y, (time.time() - t1) / RUNS


def main(args):
    _ensure_platform()
    from sound_bubble_tpu.runtime.export import load_inputs

    fix_dir = os.path.join(args.models_dir, "test_data", "replication_test")
    mixture, names, buffers = load_inputs(fix_dir)
    gold = np.load(os.path.join(fix_dir, "filtered_output.npy"))
    print(mixture.shape)

    results = {}
    print("[JAX/StableHLO]")
    results["jax"] = eval_jax(args.models_dir, mixture, names, buffers)
    print("[ONNX numpy-eval]")
    results["onnx"] = eval_onnx(args.models_dir, mixture, names, buffers)
    print("[TFLITE]")
    results["tflite"] = eval_tflite(args.models_dir, mixture, names, buffers)
    print("[NATIVE C++]")
    results["native"] = eval_native(args.models_dir, mixture, names, buffers)
    print("[NATIVE C++ int8]")
    results["native_int8"] = eval_native(args.models_dir, mixture, names,
                                         buffers, weights="weights_int8.bin")

    for name, (y, t) in results.items():
        if y is None:
            print(f"{name}: unavailable")
            continue
        err = np.abs(np.asarray(y) - gold).max()
        # int8 artifacts drift by quantization error (same envelope as the
        # reference's dynamic-quantized ONNX, to_onnx.py:150-160)
        tol = 5e-2 if name.endswith("int8") else 1e-3
        print(f"{name}: {t * 1000:.3f}ms  max|err| vs gold = {err:.2e}"
              + ("  (int8 tol)" if tol > 1e-3 else ""))
        assert err < tol, f"{name} output mismatch"


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--models_dir", default="models")
    main(p.parse_args())
