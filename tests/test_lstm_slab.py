"""Slab-grid Pallas LSTM training kernels vs the XLA fused scan / autodiff.

Interpret mode on CPU (conftest pins the CPU backend); the same kernels
lower to Mosaic on TPU. Conventions mirror tests/test_rnn.py: f32 grads
pinned to the default-path autodiff at 1e-5-level, mixed precision pinned
to autodiff OF THE SAME PRIMAL (bf16 rounding makes cross-primal bitwise
comparison meaningless).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sound_bubble_tpu.ops.rnn as rnn
from sound_bubble_tpu.ops.pallas import lstm_train_slab as slab


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _params(rng, c, h, dtype=jnp.float32):
    return {
        "w_ih": jnp.asarray(rng.standard_normal((c, 4 * h)) * 0.3, dtype),
        "w_hh": jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.3, dtype),
        "b": jnp.asarray(rng.standard_normal(4 * h) * 0.1, dtype),
    }


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("t_len", [16, 13, 5])   # K|T, K∤T, T<K (K=8)
def test_slab_primal_matches_fused_f32(rng, reverse, t_len):
    c, h, r = 5, 4, 3
    p = _params(rng, c, h)
    x = jnp.asarray(rng.standard_normal((t_len, r, c)), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((r, h)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((r, h)), jnp.float32)

    ys, hT, cT = slab.lstm_slab(reverse, p["w_ih"], p["w_hh"], p["b"],
                                x, h0, c0)
    ys_r, hT_r, cT_r = rnn.lstm_fused(reverse, p["w_ih"], p["w_hh"],
                                      p["b"], x, h0, c0)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_r), atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("t_len", [16, 13])
def test_slab_grads_match_autodiff_f32(rng, reverse, t_len):
    """Slab custom backward vs XLA autodiff of the default lstm() primal
    (identical f32 math), including dh0/dc0 via nonzero initial states."""
    c, h, r = 5, 4, 3
    p = _params(rng, c, h)
    x = jnp.asarray(rng.standard_normal((t_len, r, c)), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((r, h)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((r, h)), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((t_len, r, h)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((r, h)), jnp.float32)

    def loss_slab(p, x, h0, c0):
        ys, hT, cT = slab.lstm_slab(reverse, p["w_ih"], p["w_hh"], p["b"],
                                    x, h0, c0)
        return (jnp.sum(ys * wy) + jnp.sum(hT * ws)
                + jnp.sum(cT * ws * 0.5))

    def loss_ref(p, x, h0, c0):
        ys, hT, cT = rnn.lstm_fused(reverse, p["w_ih"], p["w_hh"], p["b"],
                                    x, h0, c0)
        return (jnp.sum(ys * wy) + jnp.sum(hT * ws)
                + jnp.sum(cT * ws * 0.5))

    try:
        rnn.set_fused_scan(False)   # reference grads via plain autodiff
        g = jax.grad(loss_slab, argnums=(0, 1, 2, 3))(p, x, h0, c0)
        ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p, x, h0, c0)
    finally:
        rnn.set_fused_scan(True)
    for gl, rl in zip(jax.tree_util.tree_leaves(g),
                      jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                   rtol=2e-5, atol=2e-5)


def test_slab_grads_match_autodiff_mixed(rng):
    """Mixed precision (bf16 weights/x, f32 carry): slab custom backward vs
    autodiff of the slab primal itself (rnn.py convention)."""
    c, h, r, t_len = 5, 4, 3, 13
    p = _params(rng, c, h, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((t_len, r, c)), jnp.bfloat16)
    h0 = jnp.zeros((r, h), jnp.float32)
    c0 = jnp.zeros((r, h), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((t_len, r, h)), jnp.float32)

    def loss_cvjp(p):
        ys, _, _ = slab.lstm_slab(False, p["w_ih"], p["w_hh"], p["b"],
                                  x, h0, c0)
        return jnp.sum(ys.astype(jnp.float32) * wy)

    def loss_primal(p):
        # autodiff reference: the XLA fused-scan primal (identical gate
        # math/dtype choreography; Pallas calls themselves have no JVP)
        _, ys = rnn._lstm_fused_primal(False, p["w_ih"], p["w_hh"],
                                       p["b"], x, h0, c0, residuals=False)
        return jnp.sum(ys.astype(jnp.float32) * wy)

    # near-identical primal: the slab forward replicates _fused_gate_fwd's
    # op order and f32 accumulation, but evaluates bf16 transcendentals as
    # upcast->f32 op->round (slab._sig/_tanh — required for Mosaic, and what
    # XLA itself does ON TPU), while CPU XLA's native-bf16 logistic rounds
    # per expansion step. One bf16 ulp per gate; loss-sum cancellation can
    # amplify it, hence a bf16-scale tolerance here (TPU-vs-TPU parity is
    # pinned tighter by tools/slab_tpu_check.py on device).
    assert float(loss_cvjp(p)) == pytest.approx(float(loss_primal(p)),
                                                rel=1e-2)
    g = jax.grad(loss_cvjp)(p)
    ref = jax.grad(loss_primal)(p)
    # bf16-rounded grads: max-norm-relative criterion (test_rnn.py mixed
    # convention — elementwise rtol is meaningless at bf16 near zero)
    for gl, rl in zip(jax.tree_util.tree_leaves(g),
                      jax.tree_util.tree_leaves(ref)):
        gl = np.asarray(gl, np.float32)
        rl = np.asarray(rl, np.float32)
        denom = np.abs(rl).max() + 1e-6
        assert np.abs(gl - rl).max() / denom < 0.03, \
            (np.abs(gl - rl).max(), denom)


def test_slab_multi_row_tile(rng, monkeypatch):
    """Row tiling + row padding: force 2 row tiles with a padded remainder
    and check primal + grads against the single-tile path."""
    monkeypatch.setattr(slab, "_ROW_TILE", 16)
    c, h, r, t_len = 5, 4, 23, 13      # rp = 32 -> 2 tiles, 9 pad rows
    p = _params(rng, c, h)
    x = jnp.asarray(rng.standard_normal((t_len, r, c)), jnp.float32)
    z = jnp.zeros((r, h), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((t_len, r, h)), jnp.float32)

    def loss(p):
        ys, _, _ = slab.lstm_slab(False, p["w_ih"], p["w_hh"], p["b"],
                                  x, z, z)
        return jnp.sum(ys * wy)

    ys, hT, cT = slab.lstm_slab(False, p["w_ih"], p["w_hh"], p["b"],
                                x, z, z)
    g = jax.grad(loss)(p)

    monkeypatch.setattr(slab, "_ROW_TILE", 0)     # auto: one 32-row tile
    ys1, hT1, cT1 = slab.lstm_slab(False, p["w_ih"], p["w_hh"], p["b"],
                                   x, z, z)
    g1 = jax.grad(loss)(p)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT1), atol=1e-6)
    for gl, rl in zip(jax.tree_util.tree_leaves(g),
                      jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t_len", [16, 13])
def test_slab_through_blstm_and_lstm(rng, t_len):
    """End-to-end through ops.rnn.lstm()/blstm() with SB_LSTM_SLAB routing:
    outputs and grads match the fused-scan path."""
    c, h = 5, 4
    bp = rnn.init_blstm_params(jax.random.PRNGKey(0), c, h)
    lp = rnn.init_lstm_params(jax.random.PRNGKey(1), c, h)
    x = jnp.asarray(rng.standard_normal((2, 3, t_len, c)), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((2, 3, t_len, 2 * h)), jnp.float32)
    wl = jnp.asarray(rng.standard_normal((2, 3, t_len, h)), jnp.float32)

    def loss(bp, lp, x):
        y = rnn.blstm(bp, x)
        yl, _ = rnn.lstm(lp, x)
        return jnp.sum(y * wy) + jnp.sum(yl * wl)

    try:
        rnn.set_slab(True)
        got = loss(bp, lp, x)
        g = jax.grad(loss, argnums=(0, 1, 2))(bp, lp, x)
        rnn.set_slab(False)
        ref = loss(bp, lp, x)
        gr = jax.grad(loss, argnums=(0, 1, 2))(bp, lp, x)
    finally:
        rnn.set_slab(None)   # restore auto so later tests see the real gate
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    for gl, rl in zip(jax.tree_util.tree_leaves(g),
                      jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                   rtol=2e-5, atol=2e-5)


def test_slab_auto_route_is_scoped_to_measured_regime(monkeypatch):
    """Auto-routing engages ONLY the measured regime — bf16/mixed trunk on a
    single-device TPU process; SB_LSTM_SLAB / set_slab forces any dtype.
    Pins the round-4 gate so an f32 eval CLI (or the driver compile check,
    or a pjit multi-device process) can never silently pick up the slab
    kernels, which are Mosaic-validated only at bf16 training shapes."""
    # test processes run on CPU: auto must stay off for every dtype
    assert rnn._slab_route(True) is False
    assert rnn._slab_route(False) is False
    # simulate the measured regime (single-device TPU)
    monkeypatch.setattr(rnn.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(rnn.jax, "device_count", lambda: 1)
    assert rnn._slab_route(True) is True     # bf16/mixed: routed
    assert rnn._slab_route(False) is False   # f32 forward: fused scan
    # multi-device TPU process keeps the fused scan until pjit-validated
    monkeypatch.setattr(rnn.jax, "device_count", lambda: 8)
    assert rnn._slab_route(True) is False
    # force wins for any dtype / backend
    try:
        rnn.set_slab(True)
        assert rnn._slab_route(False) is True
        rnn.set_slab(False)
        assert rnn._slab_route(True) is False
    finally:
        rnn.set_slab(None)   # restore auto
