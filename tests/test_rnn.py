"""LSTM op parity tests against torch (CPU oracle only — never a runtime dep)."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sound_bubble_tpu.ops.rnn import blstm, init_blstm_params, init_lstm_params, lstm


def _torch_lstm_params(tl, direction=""):
    w_ih = tl.__getattr__(f"weight_ih_l0{direction}").detach().numpy().T
    w_hh = tl.__getattr__(f"weight_hh_l0{direction}").detach().numpy().T
    b = (tl.__getattr__(f"bias_ih_l0{direction}")
         + tl.__getattr__(f"bias_hh_l0{direction}")).detach().numpy()
    return {"w_ih": jnp.asarray(w_ih), "w_hh": jnp.asarray(w_hh),
            "b": jnp.asarray(b)}


def test_lstm_matches_torch(rng):
    torch.manual_seed(0)
    B, T, C, H = 3, 11, 8, 16
    tl = torch.nn.LSTM(C, H, 1, batch_first=True)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    h0 = rng.standard_normal((B, H)).astype(np.float32)
    c0 = rng.standard_normal((B, H)).astype(np.float32)
    with torch.no_grad():
        yt, (hT, cT) = tl(torch.from_numpy(x),
                          (torch.from_numpy(h0[None]), torch.from_numpy(c0[None])))
    p = _torch_lstm_params(tl)
    y, (h, c) = lstm(p, jnp.asarray(x), jnp.asarray(h0), jnp.asarray(c0))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), hT.numpy()[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), cT.numpy()[0], atol=1e-5)


def test_blstm_matches_torch(rng):
    torch.manual_seed(1)
    B, T, C, H = 2, 9, 6, 5
    tl = torch.nn.LSTM(C, H, 1, batch_first=True, bidirectional=True)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    with torch.no_grad():
        yt, _ = tl(torch.from_numpy(x))
    p = {"fwd": _torch_lstm_params(tl), "bwd": _torch_lstm_params(tl, "_reverse")}
    y = blstm(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=1e-5)


def test_lstm_state_carry_streaming(rng):
    """Running T steps at once == two calls of T/2 steps threading (h, c)."""
    key = __import__("jax").random.PRNGKey(0)
    p = init_lstm_params(key, 4, 8)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    y_full, _ = lstm(p, x)
    y1, (h, c) = lstm(p, x[:, :5])
    y2, _ = lstm(p, x[:, 5:], h, c)
    np.testing.assert_allclose(np.asarray(y_full),
                               np.asarray(jnp.concatenate([y1, y2], axis=1)),
                               atol=1e-6)


def test_init_distributions():
    import jax
    p = init_lstm_params(jax.random.PRNGKey(0), 32, 64)
    bound = 1 / np.sqrt(64)
    assert np.abs(np.asarray(p["w_ih"])).max() <= bound
    assert np.abs(np.asarray(p["w_hh"])).max() <= bound
    assert np.abs(np.asarray(p["b"])).max() <= 2 * bound
    bp = init_blstm_params(jax.random.PRNGKey(1), 32, 64)
    assert set(bp) == {"fwd", "bwd"}
