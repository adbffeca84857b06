"""Model export for edge/serving deployment.

The reference exports TorchJIT -> ONNX -> TFLite with flattened positional
state I/O (`/root/reference/edge/to_onnx.py`). TPU-native equivalents:

- **StableHLO** (`jax.export`): portable compiled-IR artifact for any PJRT
  runtime and for ahead-of-time deployment;
- **TFLite** (`jax2tf` + TF Lite converter): the edge-CPU artifact, with the
  same `(mixture, *state_buffers) -> (filtered_output, *next_buffers)`
  positional signature and `::`-path buffer names as the reference;
- **weights blob**: a flat binary (name,shape,dtype,bytes records) consumed by
  the native C++ streaming engine in `native/`;
- **replication fixtures**: named .npy inputs/outputs for cross-runtime
  conformance (reference `models/test_data/replication_test` layout).
"""
from __future__ import annotations

import json
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import init_state
from sound_bubble_tpu.runtime.flatbuf import (
    flatten_state_buffers, unflatten_state_buffers,
)


def make_flat_step(net, params, dis_embed=None):
    """Return (fn, buffer_names, buffers0, example_mix): fn(mix, *buffers) ->
    (out, *next_buffers), the export signature."""
    cfg = net.cfg
    state0 = init_state(cfg, 1)
    names, bufs0 = flatten_state_buffers(state0)
    if dis_embed is None:
        dis_embed = jnp.asarray([[0.0, 0.0, 1.0]])

    def fn(mix, *buffers):
        state = unflatten_state_buffers(names, list(buffers))
        inputs = {"mixture": mix}
        if cfg.conditional:
            inputs["dis_embed"] = dis_embed
        out = net.apply({"params": params}, inputs, state, pad=False)
        next_names, next_bufs = flatten_state_buffers(out["next_state"])
        assert next_names == names
        return (out["output"], *next_bufs)

    example_mix = jnp.zeros(
        (1, cfg.num_ch,
         cfg.stft_back_pad + cfg.stft_chunk_size + cfg.stft_pad_size),
        jnp.float32)
    return fn, names, bufs0, example_mix


def export_stablehlo(net, params, path: str, dis_embed=None) -> str:
    """Serialize the streaming step as a StableHLO artifact."""
    fn, names, bufs0, mix = make_flat_step(net, params, dis_embed)
    exported = jax.export.export(jax.jit(fn))(mix, *bufs0)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".meta.json", "w") as f:
        json.dump({"input_names": ["mixture"] + names,
                   "output_names": ["filtered_output"]
                   + [f"out::{n}" for n in names],
                   "formats": {
                       "stablehlo": "this artifact",
                       "tflite": "see TFLite/model.tflite (export_tflite)",
                       "onnx": "see ONNX/model.onnx (runtime/onnx_export.py"
                               " — jaxpr-lowered, opset 17, validated by the"
                               " in-image numpy evaluator)"}},
                  f, indent=2)
    return path


def export_tflite(net, params, path: str, dis_embed=None,
                  quantize: bool = False) -> str:
    """jax2tf -> TFLite with named positional I/O.

    quantize=True enables the converter's dynamic-range (weights-int8)
    quantization — the TFLite analog of the reference's
    `torch.quantization.quantize_dynamic` LSTM/Linear int8 pass
    (`/root/reference/edge/to_onnx.py:150-160`)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    from sound_bubble_tpu.ops.stft import export_barriers

    fn, names, bufs0, mix = make_flat_step(net, params, dis_embed)
    tf_fn = jax2tf.convert(fn, with_gradient=False)
    specs = [tf.TensorSpec(mix.shape, tf.float32, name="mixture")] + [
        tf.TensorSpec(b.shape, tf.float32, name=n.replace(":", "_"))
        for n, b in zip(names, bufs0)]
    wrapped = tf.function(tf_fn, input_signature=specs, autograph=False)
    with export_barriers():
        converter = tf.lite.TFLiteConverter.from_concrete_functions(
            [wrapped.get_concrete_function()])
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
        if quantize:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
        blob = converter.convert()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def _quantizable(name: str, arr: np.ndarray) -> bool:
    """Matrix weights the reference's dynamic quantization would cover
    (nn.LSTM + nn.Linear weights, `to_onnx.py:150-160`): 2-D kernels of the
    projections and the LSTM input/recurrent matrices."""
    if arr.ndim < 2 or min(arr.shape) < 8:
        return False
    leaf = name.rsplit(".", 1)[-1]
    return leaf in ("kernel", "w_ih", "w_hh", "up_kernel")


def export_weights_blob(params, path: str, quantize: bool = False) -> str:
    """Flat binary for the native C++ engine.

    f32 (magic SBTW0001): records of
      [u32 name_len][name][u8 ndim][u32 dims...][u32 nbytes][f32 data].
    int8 weight-only (magic SBTW0002, quantize=True): each record gains a
      [u8 dtype] (0=f32, 1=int8) after the dims; int8 records carry
      [u32 n_scales][f32 scales...] (symmetric per-output-channel, minor dim)
      before the data. The analog of the reference's dynamic int8
      LSTM/Linear quantization; ~4x smaller hot weights."""
    leaves = {}

    def walk(prefix, tree):
        for k in sorted(tree.keys()):
            v = tree[k]
            if isinstance(v, dict):
                walk(prefix + k + ".", v)
            else:
                leaves[prefix + k] = np.asarray(v, np.float32)

    walk("", params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"SBTW0002" if quantize else b"SBTW0001")
        f.write(struct.pack("<I", len(leaves)))
        for name, arr in leaves.items():
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            f.write(struct.pack("<B", arr.ndim))
            for d in arr.shape:
                f.write(struct.pack("<I", d))
            if quantize:
                if _quantizable(name, arr):
                    flat = np.ascontiguousarray(arr).reshape(-1, arr.shape[-1])
                    scales = (np.abs(flat).max(axis=0) / 127.0
                              ).astype(np.float32)
                    scales = np.maximum(scales, 1e-12)
                    q = np.clip(np.round(flat / scales[None, :]),
                                -127, 127).astype(np.int8)
                    f.write(struct.pack("<B", 1))
                    f.write(struct.pack("<I", len(scales)))
                    f.write(scales.tobytes())
                    data = q.tobytes()
                else:
                    f.write(struct.pack("<B", 0))
                    data = np.ascontiguousarray(arr).tobytes()
            else:
                data = np.ascontiguousarray(arr).tobytes()
            f.write(struct.pack("<I", len(data)))
            f.write(data)
    return path


def dump_replication_fixtures(net, params, out_dir: str, dis_embed=None,
                              seed: int = 0) -> None:
    """Reference `models/test_data/replication_test` layout: input_names.txt,
    output_names.txt and one .npy per named tensor."""
    fn, names, bufs0, mix = make_flat_step(net, params, dis_embed)
    rng = np.random.default_rng(seed)
    mix = jnp.asarray(rng.standard_normal(mix.shape).astype(np.float32) * 10)
    outs = jax.jit(fn)(mix, *bufs0)

    os.makedirs(out_dir, exist_ok=True)
    input_names = ["mixture"] + names
    output_names = ["filtered_output"] + [f"out::{n}" for n in names]
    with open(os.path.join(out_dir, "input_names.txt"), "w") as f:
        f.write("\n".join(input_names))
    with open(os.path.join(out_dir, "output_names.txt"), "w") as f:
        f.write("\n".join(output_names))
    np.save(os.path.join(out_dir, "mixture.npy"), np.asarray(mix))
    for n, b in zip(names, bufs0):
        np.save(os.path.join(out_dir, f"{n}.npy"), np.asarray(b))
    for n, o in zip(output_names, outs):
        np.save(os.path.join(out_dir, f"{n}.npy"), np.asarray(o))


def load_inputs(test_path: str):
    """Reference `edge/edge_utils.load_inputs`."""
    with open(os.path.join(test_path, "input_names.txt")) as f:
        names = [x.strip() for x in f.readlines()]
    mixture = np.load(os.path.join(test_path, "mixture.npy"))
    names.remove("mixture")
    buffers = [np.load(os.path.join(test_path, f"{n}.npy")) for n in names]
    return mixture, names, buffers
