"""ONNX export conformance (reference edge/to_onnx.py:116-190 role).

The reference traces its streaming model with `torch.onnx.export` and
validates the artifact with onnxruntime in the same script. Here the
artifact is produced by lowering the model's own jaxpr
(runtime/onnx_export.py) and validated by the from-scratch numpy evaluator
(runtime/onnx_eval.py) — these tests close that loop in-image:

  1. wire-format roundtrip (serialize -> parse -> same graph),
  2. generic jaxpr lowering on a scan/reverse/matmul toy,
  3. the production streaming step: multi-chunk ONNX-vs-JAX parity for the
     pretrain-shape config and the conv_lstm / look-back / attention
     variants (same variant set as the full-net torch parity test).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sound_bubble_tpu.runtime import onnx_wire as ow
from sound_bubble_tpu.runtime.onnx_eval import OnnxEvaluator
from sound_bubble_tpu.runtime.onnx_export import (
    export_onnx, lower_closed_jaxpr,
)


def test_wire_roundtrip(tmp_path):
    w = ow.Tensor("w", np.arange(6, dtype=np.float32).reshape(2, 3))
    g = ow.Graph(
        "g",
        [ow.Node("MatMul", ["x", "w"], ["y"]),
         ow.Node("Concat", ["y", "y"], ["z"], {"axis": 1})],
        [ow.ValueInfo("x", ow._NP2ONNX[np.dtype(np.float32)], (4, 2))],
        [ow.ValueInfo("z", ow._NP2ONNX[np.dtype(np.float32)], (4, 6))])
    g.initializers = [w]
    path = str(tmp_path / "m.onnx")
    ow.save(ow.Model(g), path)
    m2 = ow.load(path)
    g2 = m2.graph
    assert [n.op_type for n in g2.nodes] == ["MatMul", "Concat"]
    assert g2.nodes[1].attrs["axis"] == 1
    np.testing.assert_array_equal(g2.initializers[0].array, w.array)
    assert g2.inputs[0].shape == (4, 2)


def test_lower_toy_scan(tmp_path):
    """scan + reverse scan + matmul + nonlinearity: the BLSTM skeleton."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))

    def f(x, h0):
        def cell(h, xt):
            h = jnp.tanh(xt @ w + h @ w)
            return h, h
        _, ys = jax.lax.scan(cell, h0, x)
        _, ys_r = jax.lax.scan(cell, h0, x, reverse=True)
        return jnp.concatenate([ys, ys_r], axis=-1)

    x = jnp.asarray(rng.standard_normal((5, 3, 4)).astype(np.float32))
    h0 = jnp.zeros((3, 4), jnp.float32)
    closed = jax.make_jaxpr(f)(x, h0)
    g = lower_closed_jaxpr(closed, ["x", "h0"], "toy", ["y"])
    path = str(tmp_path / "toy.onnx")
    ow.save(ow.Model(g), path)
    got = OnnxEvaluator(path).run({"x": np.asarray(x),
                                   "h0": np.asarray(h0)})["y"]
    np.testing.assert_allclose(got, np.asarray(f(x, h0)), atol=1e-6)


BASE = dict(stft_chunk_size=32, stft_pad_size=16, stft_back_pad=0,
            num_ch=6, D=8, B=2, H=8, L=2, E=2, use_attn=False,
            chunk_causal=True, use_first_ln=True, merge_method="early_cat",
            conv_lstm=False, dis_type="conv3")

VARIANTS = {
    "base": {},
    "conv_lstm": {"conv_lstm": True, "lstm_down": 2},
    "backpad": {"stft_back_pad": 8},
    "attn": {"use_attn": True, "local_atten_len": 8},
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_streaming_step_parity(tmp_path, variant):
    from sound_bubble_tpu.models.tfgridnet.model import make_net
    from sound_bubble_tpu.runtime.export import make_flat_step

    net = make_net({**BASE, **VARIANTS[variant]}, conditional=True)
    cfg = net.cfg
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 6, cfg.n_fft)).astype(np.float32))
    dis = jnp.asarray([[0.0, 1.0, 0.0]])
    params = net.init(jax.random.PRNGKey(0),
                      {"mixture": x, "dis_embed": dis})["params"]

    path = export_onnx(net, params, str(tmp_path / "ONNX" / "model.onnx"),
                       dis_embed=dis)
    ev = OnnxEvaluator(path)

    fn, names, bufs, mix_ex = make_flat_step(net, params, dis_embed=dis)
    jfn = jax.jit(fn)
    np_bufs = [np.asarray(b) for b in bufs]
    for chunk in range(3):
        mix = rng.standard_normal(mix_ex.shape).astype(np.float32) * 0.3
        ref = jfn(jnp.asarray(mix), *[jnp.asarray(b) for b in np_bufs])
        feeds = {"mixture": mix}
        feeds.update({n: b for n, b in zip(names, np_bufs)})
        got = ev.run(feeds)
        np.testing.assert_allclose(
            got["filtered_output"], np.asarray(ref[0]), atol=2e-5,
            err_msg=f"{variant} chunk {chunk} output")
        for i, n in enumerate(names):
            np.testing.assert_allclose(
                got[f"out::{n}"], np.asarray(ref[1 + i]), atol=2e-5,
                err_msg=f"{variant} chunk {chunk} state {n}")
        np_bufs = [got[f"out::{n}"] for n in names]
