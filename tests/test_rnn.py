"""LSTM op parity tests against torch (CPU oracle only — never a runtime dep)."""
import jax
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


def test_custom_vjp_matches_autodiff_f32(rng):
    """SB_LSTM_CUSTOM_VJP path: primal AND gradients must match the lax.scan
    autodiff path (f32: near-exact)."""
    import sound_bubble_tpu.ops.rnn as rnn

    p = rnn.init_lstm_params(jax.random.PRNGKey(0), 6, 5)
    bp = rnn.init_blstm_params(jax.random.PRNGKey(1), 6, 5)
    x = jnp.asarray(rng.standard_normal((3, 11, 6)).astype(np.float32))

    def loss_l(params, x):
        y, (hT, cT) = rnn.lstm(params, x)
        return jnp.sum(y ** 2) + jnp.sum(hT * cT)

    def loss_b(params, x):
        return jnp.sum(rnn.blstm(params, x) ** 2)

    try:
        rnn.set_custom_vjp(False)
        ref_l = jax.grad(loss_l, argnums=(0, 1))(p, x)
        ref_v = loss_l(p, x)
        ref_b = jax.grad(loss_b, argnums=(0, 1))(bp, x)
        rnn.set_custom_vjp(True)
        got_l = jax.grad(loss_l, argnums=(0, 1))(p, x)
        got_v = loss_l(p, x)
        got_b = jax.grad(loss_b, argnums=(0, 1))(bp, x)
    finally:
        rnn.set_custom_vjp(False)

    assert got_v == pytest.approx(float(ref_v), rel=1e-6)
    for ref, got in ((ref_l, got_l), (ref_b, got_b)):
        for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                          jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                       rtol=2e-5, atol=2e-5)


def test_fused_scan_matches_autodiff_f32(rng):
    """SB_LSTM_FUSED path: in-scan gate computation + carried weight-grad
    accumulators must reproduce the lax.scan autodiff path — primal AND
    gradients, for the unidirectional LSTM (with state) and the BLSTM
    (whose reversed direction runs as scan(reverse=True), no flips)."""
    import sound_bubble_tpu.ops.rnn as rnn

    p = rnn.init_lstm_params(jax.random.PRNGKey(0), 6, 5)
    bp = rnn.init_blstm_params(jax.random.PRNGKey(1), 6, 5)
    x = jnp.asarray(rng.standard_normal((3, 11, 6)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))

    def loss_l(params, x, h0, c0):
        y, (hT, cT) = rnn.lstm(params, x, h0, c0)
        return jnp.sum(y ** 2) + jnp.sum(hT * cT)

    def loss_b(params, x):
        return jnp.sum(rnn.blstm(params, x) ** 2)

    try:
        rnn.set_fused_scan(False)
        ref_v = loss_l(p, x, h0, c0)
        ref_l = jax.grad(loss_l, argnums=(0, 1, 2, 3))(p, x, h0, c0)
        ref_bv = loss_b(bp, x)
        ref_b = jax.grad(loss_b, argnums=(0, 1))(bp, x)
        rnn.set_fused_scan(True)
        got_v = loss_l(p, x, h0, c0)
        got_l = jax.grad(loss_l, argnums=(0, 1, 2, 3))(p, x, h0, c0)
        got_bv = loss_b(bp, x)
        got_b = jax.grad(loss_b, argnums=(0, 1))(bp, x)
    finally:
        rnn.set_fused_scan(False)

    assert got_v == pytest.approx(float(ref_v), rel=1e-6)
    assert got_bv == pytest.approx(float(ref_bv), rel=1e-6)
    for ref, got in ((ref_l, got_l), (ref_b, got_b)):
        for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                          jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                       rtol=2e-5, atol=2e-5)


def test_fused_scan_matches_autodiff_mixed(rng):
    """Mixed precision (bf16 weights, fp32 carry): the fused-scan custom
    backward must agree with AUTODIFF OF THE SAME FUSED PRIMAL (the fused
    forward keeps the x-projection in f32 — one fewer bf16 rounding than the
    hoisted-gates path, so vs the default path we only assert bf16-ulp
    forward agreement)."""
    import sound_bubble_tpu.ops.rnn as rnn
    from sound_bubble_tpu.utils import cast_bf16

    p = cast_bf16(rnn.init_lstm_params(jax.random.PRNGKey(2), 6, 5))
    x = jnp.asarray(rng.standard_normal((2, 9, 6)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    x_t = jnp.moveaxis(x, 1, 0)
    h0 = jnp.zeros((2, 5), jnp.float32)

    def loss_custom(params, x_t):
        ys, hT, cT = rnn.lstm_fused(False, params["w_ih"], params["w_hh"],
                                    params["b"], x_t, h0, h0)
        return jnp.sum(ys.astype(jnp.float32) ** 2) \
            + jnp.sum(hT * cT).astype(jnp.float32)

    def loss_ad(params, x_t):
        (hT, cT), ys = rnn._lstm_fused_primal(
            False, params["w_ih"], params["w_hh"], params["b"], x_t, h0, h0,
            residuals=False)
        return jnp.sum(ys.astype(jnp.float32) ** 2) \
            + jnp.sum(hT * cT).astype(jnp.float32)

    ref_v = float(loss_ad(p, x_t))
    got_v = float(loss_custom(p, x_t))
    assert got_v == pytest.approx(ref_v, rel=1e-6)  # identical primal
    ref = jax.grad(loss_ad, argnums=(0, 1))(p, x_t)
    got = jax.grad(loss_custom, argnums=(0, 1))(p, x_t)
    for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                      jax.tree_util.tree_leaves(got)):
        rl, gl = np.asarray(rl, np.float32), np.asarray(gl, np.float32)
        denom = np.abs(rl).max() + 1e-6
        assert np.abs(gl - rl).max() / denom < 0.03, \
            (np.abs(gl - rl).max(), denom)

    # fused vs default forward: bf16-ulp agreement (not bitwise — see above)
    try:
        rnn.set_fused_scan(False)
        y_ref, _ = rnn.lstm(p, x)
        rnn.set_fused_scan(True)
        y_got, _ = rnn.lstm(p, x)
    finally:
        rnn.set_fused_scan(False)
    y_ref = np.asarray(y_ref, np.float32)
    y_got = np.asarray(y_got, np.float32)
    assert np.abs(y_got - y_ref).max() <= 0.02 * (np.abs(y_ref).max() + 1e-6)


@pytest.mark.parametrize("chunk,T", [(4, 11), (4, 12), (8, 16), (5, 23)])
def test_fused_scan_chunked_matches_plain(rng, chunk, T):
    """The K-frames-per-iteration blocking (incl. the T%K tail chain) is a
    pure re-stacking: primal and grads must match the per-frame fused scan,
    in both directions."""
    import sound_bubble_tpu.ops.rnn as rnn

    p = rnn.init_lstm_params(jax.random.PRNGKey(7), 6, 5)
    bp = rnn.init_blstm_params(jax.random.PRNGKey(8), 6, 5)
    x = jnp.asarray(rng.standard_normal((3, T, 6)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))

    def loss_l(params, x):
        y, (hT, cT) = rnn.lstm(params, x, h0, c0)
        return jnp.sum(y ** 2) + jnp.sum(hT * cT)

    def loss_b(params, x):
        return jnp.sum(rnn.blstm(params, x) ** 2)

    saved = rnn._FUSED_CHUNK
    try:
        rnn.set_fused_scan(True)
        rnn._FUSED_CHUNK = 1
        ref_v = loss_l(p, x)
        ref_l = jax.grad(loss_l, argnums=(0, 1))(p, x)
        ref_b = jax.grad(loss_b, argnums=(0, 1))(bp, x)
        rnn._FUSED_CHUNK = chunk
        got_v = loss_l(p, x)
        got_l = jax.grad(loss_l, argnums=(0, 1))(p, x)
        got_b = jax.grad(loss_b, argnums=(0, 1))(bp, x)
    finally:
        rnn.set_fused_scan(False)
        rnn._FUSED_CHUNK = saved

    assert got_v == pytest.approx(float(ref_v), rel=1e-6)
    for ref, got in ((ref_l, got_l), (ref_b, got_b)):
        for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                          jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk_bwd,T", [(3, 13), (8, 16)])
def test_fused_scan_separate_bwd_chunk(rng, chunk_bwd, T):
    """SB_LSTM_CHUNK_BWD re-blocks only the backward scans; grads must be
    identical to the symmetric-chunk path (pure re-stacking)."""
    import sound_bubble_tpu.ops.rnn as rnn

    p = rnn.init_lstm_params(jax.random.PRNGKey(7), 6, 5)
    bp = rnn.init_blstm_params(jax.random.PRNGKey(8), 6, 5)
    x = jnp.asarray(rng.standard_normal((3, T, 6)).astype(np.float32))

    def loss_l(params, x):
        y, _ = rnn.lstm(params, x)
        return jnp.sum(y ** 2)

    def loss_b(params, x):
        return jnp.sum(rnn.blstm(params, x) ** 2)

    saved = (rnn._FUSED_CHUNK, rnn._FUSED_CHUNK_BWD, rnn._DIR_FUSE)
    try:
        rnn.set_fused_scan(True)
        rnn.set_dir_fuse(True)
        rnn._FUSED_CHUNK, rnn._FUSED_CHUNK_BWD = 6, None
        ref_l = jax.grad(loss_l, argnums=(0, 1))(p, x)
        ref_b = jax.grad(loss_b, argnums=(0, 1))(bp, x)
        rnn._FUSED_CHUNK_BWD = chunk_bwd
        got_l = jax.grad(loss_l, argnums=(0, 1))(p, x)
        got_b = jax.grad(loss_b, argnums=(0, 1))(bp, x)
    finally:
        rnn.set_fused_scan(False)
        rnn._FUSED_CHUNK, rnn._FUSED_CHUNK_BWD, _df = saved
        rnn.set_dir_fuse(_df)

    for ref, got in ((ref_l, got_l), (ref_b, got_b)):
        for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                          jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                       rtol=1e-5, atol=1e-5)


def test_fused_scan_streaming_equivalence(rng):
    """Fused path == default path on the forward, incl. carried state and
    the reverse direction used by blstm."""
    import sound_bubble_tpu.ops.rnn as rnn

    p = rnn.init_lstm_params(jax.random.PRNGKey(4), 4, 8)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    ref_y, (ref_h, ref_c) = rnn.lstm(p, x)
    ref_yr, _ = rnn.lstm(p, x, reverse=True)
    try:
        rnn.set_fused_scan(True)
        got_y, (got_h, got_c) = rnn.lstm(p, x)
        got_yr, _ = rnn.lstm(p, x, reverse=True)
    finally:
        rnn.set_fused_scan(False)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_yr), np.asarray(ref_yr),
                               atol=1e-6)


def test_custom_vjp_matches_autodiff_mixed(rng):
    """Mixed precision (bf16 weights, fp32 carry): the custom backward
    differentiates the same primal as autodiff — grads agree to bf16
    cotangent-storage tolerance."""
    import sound_bubble_tpu.ops.rnn as rnn
    from sound_bubble_tpu.utils import cast_bf16

    p = cast_bf16(rnn.init_lstm_params(jax.random.PRNGKey(2), 6, 5))
    x = jnp.asarray(rng.standard_normal((2, 9, 6)).astype(np.float32)) \
        .astype(jnp.bfloat16)

    def loss(params, x):
        y, _ = rnn.lstm(params, x)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    try:
        rnn.set_custom_vjp(False)
        ref_v = float(loss(p, x))
        ref = jax.grad(loss, argnums=(0, 1))(p, x)
        rnn.set_custom_vjp(True)
        got_v = float(loss(p, x))
        got = jax.grad(loss, argnums=(0, 1))(p, x)
    finally:
        rnn.set_custom_vjp(False)

    assert got_v == pytest.approx(ref_v, rel=1e-5)  # identical primal
    for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                      jax.tree_util.tree_leaves(got)):
        rl, gl = np.asarray(rl, np.float32), np.asarray(gl, np.float32)
        denom = np.abs(rl).max() + 1e-6
        assert np.abs(gl - rl).max() / denom < 0.03, \
            (np.abs(gl - rl).max(), denom)


def test_dir_fused_blstm_matches_autodiff_f32(rng):
    """SB_BLSTM_DIRFUSE: both directions in one chunked scan must reproduce
    the plain-autodiff BLSTM — primal and gradients — including a T%K tail
    (T=11, K=6) and a multi-lead-dim input."""
    import sound_bubble_tpu.ops.rnn as rnn

    bp = rnn.init_blstm_params(jax.random.PRNGKey(3), 6, 5)
    x = jnp.asarray(rng.standard_normal((2, 3, 11, 6)).astype(np.float32))

    def loss_b(params, x):
        return jnp.sum(rnn.blstm(params, x) ** 2)

    try:
        rnn.set_fused_scan(False)
        ref_v = float(loss_b(bp, x))
        ref = jax.grad(loss_b, argnums=(0, 1))(bp, x)
        rnn.set_fused_scan(True)
        rnn.set_dir_fuse(True)
        got_v = float(loss_b(bp, x))
        got = jax.grad(loss_b, argnums=(0, 1))(bp, x)
    finally:
        rnn.set_fused_scan(False)
        rnn.set_dir_fuse(False)

    assert got_v == pytest.approx(ref_v, rel=1e-6)
    for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                      jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                                   rtol=2e-5, atol=2e-5)


def test_dir_fused_blstm_matches_two_scan_fused_mixed(rng):
    """Mixed precision: the direction-fused scan must agree with the
    two-scan fused path (identical gate math, so primal matches to fp32
    round-off; grads compared at 3% of max like the other mixed tests)."""
    import sound_bubble_tpu.ops.rnn as rnn
    from sound_bubble_tpu.utils import cast_bf16

    bp = cast_bf16(rnn.init_blstm_params(jax.random.PRNGKey(4), 6, 5))
    x = jnp.asarray(rng.standard_normal((3, 13, 6)).astype(np.float32)) \
        .astype(jnp.bfloat16)

    def loss_b(params, x):
        return jnp.sum(rnn.blstm(params, x).astype(jnp.float32) ** 2)

    try:
        rnn.set_fused_scan(True)
        ref_v = float(loss_b(bp, x))
        ref = jax.grad(loss_b, argnums=(0, 1))(bp, x)
        rnn.set_dir_fuse(True)
        got_v = float(loss_b(bp, x))
        got = jax.grad(loss_b, argnums=(0, 1))(bp, x)
    finally:
        rnn.set_fused_scan(False)
        rnn.set_dir_fuse(False)

    assert got_v == pytest.approx(ref_v, rel=1e-5)
    for rl, gl in zip(jax.tree_util.tree_leaves(ref),
                      jax.tree_util.tree_leaves(got)):
        rl, gl = np.asarray(rl, np.float32), np.asarray(gl, np.float32)
        denom = np.abs(rl).max() + 1e-6
        assert np.abs(gl - rl).max() / denom < 0.03, \
            (np.abs(gl - rl).max(), denom)
