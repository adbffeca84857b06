"""Training-time fused Pallas LSTM kernels vs the lax.scan reference.

Runs in interpret mode on CPU (conftest forces the CPU backend); the same
kernels lower to Mosaic on TPU. Reference semantics: the inter/intra LSTMs
of the production separator
(/root/reference/src/models/tfgridnet_realtime_clean_dis_embd3/tfgridnet_causal.py:800-849).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sound_bubble_tpu.ops.rnn as rnn
from sound_bubble_tpu.ops.pallas.lstm_train_kernel import lstm_pallas_train
from sound_bubble_tpu.utils import cast_bf16


def _rel_max_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-6)


@pytest.mark.parametrize("shape", [(5, 37, 12, 16),   # pad rows to 48
                                   (3, 64, 8, 8)])    # no padding needed
def test_pallas_lstm_f32_primal_exact(rng, shape):
    t, r, c, h = shape
    p = rnn.init_lstm_params(jax.random.PRNGKey(0), c, h)
    x = jnp.asarray(rng.standard_normal((r, t, c)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((r, h)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((r, h)).astype(np.float32))

    y_ref, (hT_ref, cT_ref) = rnn.lstm(p, x, h0=h0, c0=c0)
    y, hT, cT = lstm_pallas_train(p["w_ih"], p["w_hh"], p["b"],
                                  jnp.moveaxis(x, -2, 0), h0, c0)
    np.testing.assert_array_equal(np.asarray(jnp.moveaxis(y, 0, -2)),
                                  np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(hT), np.asarray(hT_ref))
    np.testing.assert_array_equal(np.asarray(cT), np.asarray(cT_ref))


def test_pallas_lstm_f32_grads_match_autodiff(rng):
    t, r, c, h = 7, 21, 6, 8
    p = rnn.init_lstm_params(jax.random.PRNGKey(1), c, h)
    x = jnp.asarray(rng.standard_normal((r, t, c)).astype(np.float32))
    x_t = jnp.moveaxis(x, -2, 0)
    h0 = jnp.asarray(rng.standard_normal((r, h)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((r, h)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((r, t, h)).astype(np.float32))

    def loss_scan(p, x, hh, cc):
        y, (hT, cT) = rnn.lstm(p, x, h0=hh, c0=cc)
        return jnp.sum(y * w) + jnp.sum(hT * cT)

    def loss_pallas(p, x, hh, cc):
        y, hT, cT = lstm_pallas_train(p["w_ih"], p["w_hh"], p["b"],
                                      jnp.moveaxis(x, -2, 0), hh, cc)
        return jnp.sum(jnp.moveaxis(y, 0, -2) * w) + jnp.sum(hT * cT)

    ref = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(p, x, h0, c0)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(p, x, h0, c0)
    for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                      jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                   rtol=2e-5, atol=2e-5)


def test_pallas_lstm_mixed_primal_and_grads(rng):
    """bf16 weights/activations, fp32 carries: bf16-ulp primal agreement,
    grads within the same 3%-of-max band as the scan custom VJP (XLA fuses
    each program's cell body and may elide intermediate bf16 roundings, so
    bitwise equality across programs does not exist — see kernel docs)."""
    t, r, c, h = 9, 20, 6, 8
    p = cast_bf16(rnn.init_lstm_params(jax.random.PRNGKey(2), c, h))
    x = jnp.asarray(rng.standard_normal((r, t, c)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    x_t = jnp.moveaxis(x, -2, 0)
    h0 = jnp.asarray(rng.standard_normal((r, h)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((r, h)).astype(np.float32))

    y_ref, (hT_ref, cT_ref) = rnn.lstm(p, x, h0=h0, c0=c0)
    y, hT, cT = lstm_pallas_train(p["w_ih"], p["w_hh"], p["b"], x_t, h0, c0)
    assert _rel_max_err(jnp.moveaxis(y, 0, -2).astype(jnp.float32),
                        y_ref.astype(jnp.float32)) < 0.02
    assert _rel_max_err(cT, cT_ref) < 0.02

    def loss_scan(p, hh, cc):
        y, (hT, cT) = rnn.lstm(p, x, h0=hh, c0=cc)
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(hT * cT)

    def loss_pallas(p, hh, cc):
        y, hT, cT = lstm_pallas_train(p["w_ih"], p["w_hh"], p["b"],
                                      x_t, hh, cc)
        return (jnp.sum(jnp.moveaxis(y, 0, -2).astype(jnp.float32) ** 2)
                + jnp.sum(hT * cT))

    ref = jax.grad(loss_scan, argnums=(0, 1, 2))(p, h0, c0)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(p, h0, c0)
    for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                      jax.tree_util.tree_leaves(got)):
        assert _rel_max_err(gl, rl) < 0.03


def test_pallas_lstm_multi_row_tile(rng):
    """r > 768 exercises the multi-tile grid path (row tiling + padding +
    carry reset at each tile's t==0)."""
    t, r, c, h = 3, 900, 4, 8
    p = rnn.init_lstm_params(jax.random.PRNGKey(3), c, h)
    x_t = jnp.asarray(rng.standard_normal((t, r, c)).astype(np.float32))
    z0 = jnp.zeros((r, h), jnp.float32)
    y, hT, cT = lstm_pallas_train(p["w_ih"], p["w_hh"], p["b"], x_t, z0, z0)
    y_ref, (hT_ref, cT_ref) = rnn.lstm(p, jnp.moveaxis(x_t, 0, -2))
    np.testing.assert_array_equal(np.asarray(jnp.moveaxis(y, 0, -2)),
                                  np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(cT), np.asarray(cT_ref))


def test_set_pallas_train_routes_lstm_and_blstm(rng):
    """The SB_LSTM_PALLAS_TRAIN knob routes lstm() AND blstm() through the
    fused kernels (flattening >1 lead dims) with unchanged f32 results."""
    p = rnn.init_lstm_params(jax.random.PRNGKey(4), 6, 8)
    bp = rnn.init_blstm_params(jax.random.PRNGKey(5), 6, 8)
    x4 = jnp.asarray(rng.standard_normal((3, 4, 10, 6)).astype(np.float32))

    y_ref, (hT_ref, cT_ref) = rnn.lstm(p, x4)
    yb_ref = rnn.blstm(bp, x4.reshape(12, 10, 6))
    try:
        rnn.set_pallas_train(True)
        y, (hT, cT) = rnn.lstm(p, x4)
        yb = rnn.blstm(bp, x4.reshape(12, 10, 6))
    finally:
        rnn.set_pallas_train(False)
        rnn.set_custom_vjp(False)
    # lead-dim flattening reshapes the gates_x matmul -> f32-ulp differences
    for got, ref in ((y, y_ref), (hT, hT_ref), (cT, cT_ref), (yb, yb_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-6)


def test_blstm_pallas_f32_grads_match_autodiff(rng):
    """Fused-direction BLSTM kernel: primal + grads vs autodiff through the
    stacked-direction scan path (f32). Pins the mirrored-time index maps
    and the per-direction weight-gradient reductions."""
    from sound_bubble_tpu.ops.pallas.lstm_train_kernel import (
        blstm_pallas_train)

    t, r, c, h = 7, 20, 6, 8
    bp = rnn.init_blstm_params(jax.random.PRNGKey(6), c, h)
    x_t = jnp.asarray(rng.standard_normal((t, r, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((t, r, 2 * h)).astype(np.float32))

    def loss_ref(bp, xt):
        y = rnn.blstm(bp, jnp.moveaxis(xt, 0, -2))
        return jnp.sum(jnp.moveaxis(y, -2, 0) * w)

    def loss_pallas(bp, xt):
        return jnp.sum(blstm_pallas_train(bp["fwd"], bp["bwd"], xt) * w)

    ref_v, ref_g = jax.value_and_grad(loss_ref, argnums=(0, 1))(bp, x_t)
    got_v, got_g = jax.value_and_grad(loss_pallas, argnums=(0, 1))(bp, x_t)
    assert float(got_v) == pytest.approx(float(ref_v), rel=1e-5)
    for rl, gl in zip(jax.tree_util.tree_leaves(ref_g),
                      jax.tree_util.tree_leaves(got_g)):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                   rtol=2e-5, atol=2e-5)


def test_blstm_pallas_mixed_grads(rng):
    """Mixed precision (bf16 weights/activations): fused-direction BLSTM
    grads within the same 3%-of-max band as the single-direction kernel."""
    from sound_bubble_tpu.ops.pallas.lstm_train_kernel import (
        blstm_pallas_train)

    t, r, c, h = 9, 20, 6, 8
    bp = cast_bf16(rnn.init_blstm_params(jax.random.PRNGKey(7), c, h))
    x_t = jnp.asarray(rng.standard_normal((t, r, c)).astype(np.float32)) \
        .astype(jnp.bfloat16)

    def loss_ref(bp):
        y = rnn.blstm(bp, jnp.moveaxis(x_t, 0, -2))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_pallas(bp):
        y = blstm_pallas_train(bp["fwd"], bp["bwd"], x_t)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    ref_v, ref_g = jax.value_and_grad(loss_ref)(bp)
    got_v, got_g = jax.value_and_grad(loss_pallas)(bp)
    assert float(got_v) == pytest.approx(float(ref_v), rel=0.02)
    for rl, gl in zip(jax.tree_util.tree_leaves(ref_g),
                      jax.tree_util.tree_leaves(got_g)):
        assert _rel_max_err(gl, rl) < 0.03


def test_pallas_train_full_model_grads(rng):
    """End to end: production-architecture model (tiny dims) trains with the
    Pallas kernels — loss/grads match the scan path."""
    from sound_bubble_tpu.models.tfgridnet.model import make_net

    cfg = dict(stft_chunk_size=32, stft_pad_size=16, num_ch=2, D=8, B=2,
               H=8, L=2, E=2, I=1, J=1, local_atten_len=10, use_attn=False,
               lookahead=True, chunk_causal=True, use_first_ln=True,
               merge_method="early_cat", conv_lstm=False, dis_type="conv3")
    net = make_net(cfg)
    x = jnp.asarray(rng.standard_normal((2, 2, 320)).astype(np.float32))
    emb = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
    inputs = {"mixture": x, "dis_embed": emb}
    params = net.init(jax.random.PRNGKey(0), inputs)["params"]

    def loss(p):
        return jnp.sum(net.apply({"params": p}, inputs)["output"] ** 2)

    ref_v, ref_g = jax.value_and_grad(loss)(params)
    try:
        rnn.set_pallas_train(True)
        got_v, got_g = jax.value_and_grad(loss)(params)
    finally:
        rnn.set_pallas_train(False)
        rnn.set_custom_vjp(False)
    assert float(got_v) == pytest.approx(float(ref_v), rel=1e-5)
    for rl, gl in zip(jax.tree_util.tree_leaves(ref_g),
                      jax.tree_util.tree_leaves(got_g)):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                   rtol=5e-4, atol=5e-5)
