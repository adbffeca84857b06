"""Baseline model zoo tests: shapes, streaming state, causality."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


class TestWaveformer:
    PARAMS = dict(n_mics=6, L=8, enc_dim=32, num_enc_layers=4, dec_dim=16,
                  dec_buf_len=12, num_dec_layers=1, dec_chunk_size=4,
                  out_buf_len=2, use_pos_enc=True, skip_connection=True,
                  proj=True, lookahead=True)

    def _make(self, rng):
        from sound_bubble_tpu.models.waveformer.model import Net
        net = Net(**self.PARAMS)
        x = _rand(rng, 2, 6, 8 * 4 * 6)  # 6 decoder chunks
        variables = net.init(jax.random.PRNGKey(0), {"mixture": x})
        return net, variables, x

    def test_shapes_and_state(self, rng):
        net, variables, x = self._make(rng)
        out = net.apply(variables, {"mixture": x})
        assert out["output"].shape == (2, 1, x.shape[-1])
        enc_buf, dec_buf, out_buf = out["next_state"]
        assert enc_buf.shape == (2, 32, 2 * (2 ** 4 - 1))
        assert dec_buf.shape == (2, 2, 12, 16)
        assert out_buf.shape == (2, 32, 2)

    def test_streaming_equals_offline(self, rng):
        """Rolling-window chunk loop == one offline call (reference
        causal_infer pattern with chunk = L*dec_chunk_size, pad = 6L)."""
        net, variables, x = self._make(rng)
        L = self.PARAMS["L"]
        chunk = L * self.PARAMS["dec_chunk_size"]   # 32 samples
        pad = 6 * L
        n_chunks = 5
        sig = _rand(rng, 1, 6, chunk * n_chunks + pad)
        y_off = net.apply(variables, {"mixture": sig}, pad=False)["output"]
        state = net.init_buffers(1)
        window = jnp.zeros((1, 6, chunk + pad))
        window = window.at[..., -pad:].set(sig[..., :pad])
        outs = []
        for i in range(pad, sig.shape[-1] - chunk + 1, chunk):
            window = jnp.roll(window, -chunk, axis=-1)
            window = window.at[..., -chunk:].set(sig[..., i:i + chunk])
            o = net.apply(variables, {"mixture": window}, state, pad=False)
            outs.append(o["output"])
            state = o["next_state"]
        y_str = jnp.concatenate(outs, axis=-1)
        np.testing.assert_allclose(np.asarray(y_str), np.asarray(y_off),
                                   atol=1e-4)


class TestConvTasNet:
    PARAMS = dict(num_mic=6, L=8, N=32, B=32, H=48, P=3, X=3, R=2,
                  causal=True, norm_type="cLN")

    def _make(self, rng):
        from sound_bubble_tpu.models.convtasnet.model import Net
        net = Net(**self.PARAMS)
        x = _rand(rng, 2, 6, 800)
        variables = net.init(jax.random.PRNGKey(0), {"mixture": x})
        return net, variables, x

    def test_shapes(self, rng):
        net, variables, x = self._make(rng)
        out = net.apply(variables, {"mixture": x})
        assert out["output"].shape == (2, 1, x.shape[-1])
        assert out["next_state"] is None

    def test_causal_prefix_invariance(self, rng):
        """With causal=True and cLN, earlier outputs must not depend on
        future inputs (up to the encoder's L-sample lookahead window)."""
        net, variables, x = self._make(rng)
        y_full = np.asarray(net.apply(variables, {"mixture": x})["output"])
        x2 = x.at[..., 500:].set(0.0)
        y_cut = np.asarray(net.apply(variables, {"mixture": x2})["output"])
        np.testing.assert_allclose(y_cut[..., :480], y_full[..., :480],
                                   atol=1e-4)

    def test_gln_noncausal_variant(self, rng):
        from sound_bubble_tpu.models.convtasnet.model import Net
        p = dict(self.PARAMS)
        p.update(causal=False, norm_type="gLN")
        net = Net(**p)
        x = _rand(rng, 1, 6, 400)
        v = net.init(jax.random.PRNGKey(1), {"mixture": x})
        out = net.apply(v, {"mixture": x})
        assert out["output"].shape == (1, 1, 400)


def test_registry_aliases():
    import sound_bubble_tpu.utils as utils
    for path in ["src.models.Waveformer.net.Net",
                 "src.models.Convtasnet.net.Net"]:
        cls = utils.import_attr(path)
        assert cls is not None


class TestDCCRN:
    def test_shapes_and_finite(self, rng):
        from sound_bubble_tpu.models.dccrn.model import Net
        net = Net(n_mics=2, rnn_layers=1, rnn_units=32,
                  kernel_num=(8, 8, 16, 16, 32, 32))
        x = _rand(rng, 1, 2, 2400)
        v = net.init(jax.random.PRNGKey(0), {"mixture": x})
        out = net.apply(v, {"mixture": x})["output"]
        assert out.shape[0] == 1 and out.shape[1] == 1
        assert abs(out.shape[-1] - x.shape[-1]) <= 100  # hop rounding
        assert np.isfinite(np.asarray(out)).all()
        assert np.abs(np.asarray(out)).max() <= 1.0

    def test_clstm_variant(self, rng):
        from sound_bubble_tpu.models.dccrn.model import Net
        net = Net(n_mics=2, rnn_layers=2, rnn_units=32, use_clstm=True,
                  kernel_num=(8, 8, 16, 16, 32, 32))
        x = _rand(rng, 1, 2, 1600)
        v = net.init(jax.random.PRNGKey(0), {"mixture": x})
        out = net.apply(v, {"mixture": x})["output"]
        assert np.isfinite(np.asarray(out)).all()


class TestReSep:
    def test_shapes(self, rng):
        from sound_bubble_tpu.models.resep.model import Net
        net = Net(num_mics=2, num_spk=1)
        # shrink: patch via smaller fields is fixed; use short input
        x = _rand(rng, 1, 2, 1600)
        v = net.init(jax.random.PRNGKey(0), {"mixture": x})
        out = net.apply(v, {"mixture": x})["output"]
        assert out.shape == (1, 1, 1600)
        assert np.isfinite(np.asarray(out)).all()


class TestDccTf:
    def test_shapes(self, rng):
        from sound_bubble_tpu.models.dcc_tf.model import Net
        net = Net(label_len=3, L=8, enc_dim=16, num_enc_layers=3, dec_dim=8,
                  dec_chunk_size=4, num_dec_layers=1)
        x = _rand(rng, 2, 1, 320)
        lab = _rand(rng, 2, 3)
        v = net.init(jax.random.PRNGKey(0), {"mixture": x, "label": lab})
        out = net.apply(v, {"mixture": x, "label": lab})["output"]
        assert out.shape == (2, 1, 320)
        assert np.abs(np.asarray(out)).max() <= 1.0


class TestDCCRNBatchNorm:
    def test_running_stats_update_and_eval_use(self, rng):
        """torch BatchNorm semantics (reference ComplexBatchNorm running
        averages): train mode updates running stats; eval mode uses them."""
        import flax
        from sound_bubble_tpu.models.dccrn.model import Net
        net = Net(n_mics=2, rnn_layers=1, rnn_units=32,
                  kernel_num=(8, 8, 16, 16, 32, 32))
        x = _rand(rng, 2, 2, 2400) * 3.0
        v = net.init(jax.random.PRNGKey(0), {"mixture": x})
        assert "batch_stats" in v
        bs0 = jax.tree_util.tree_map(np.asarray, dict(v["batch_stats"]))

        out, upd = net.apply(v, {"mixture": x}, train=True,
                             mutable=["batch_stats"])
        bs1 = jax.tree_util.tree_map(np.asarray, dict(upd["batch_stats"]))
        diff = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), bs0, bs1)
        assert max(jax.tree_util.tree_leaves(diff)) > 0, \
            "running stats must move in train mode"

        # eval output must depend on the running stats
        y_init = net.apply(v, {"mixture": x})["output"]
        y_upd = net.apply({"params": v["params"], **upd},
                          {"mixture": x})["output"]
        assert np.abs(np.asarray(y_init) - np.asarray(y_upd)).max() > 0

    def test_trains_through_plmodule(self, tmp_path, rng):
        """DCCRN end-to-end through the trainer: batch_stats threaded by the
        jitted step and checkpointed."""
        import sound_bubble_tpu.utils as utils
        from sound_bubble_tpu.train.checkpoint import load_checkpoint
        module = utils.import_attr(
            "sound_bubble_tpu.train.module.PLModule")(
            model="src.models.DCCRN.network.Net",
            model_params=dict(n_mics=2, rnn_layers=1, rnn_units=32,
                              kernel_num=(8, 8, 16, 16, 32, 32)),
            sr=24000, optimizer="torch.optim.Adam",
            optimizer_params={"lr": 1e-3},
            loss="src.losses.SNRLP.SNRLPLoss",
            loss_params={"snr_loss_name": "snr", "neg_weight": 100},
            metrics=[], grad_clip=1)
        assert module.model_state, "DCCRN must carry batch_stats"
        bs0 = jax.tree_util.tree_map(
            np.asarray, flax_to_dict(module.model_state))
        x = _rand(rng, 2, 2, 2400)
        gt = _rand(rng, 2, 1, np.asarray(
            module.model({"mixture": x})["output"]).shape[-1])
        batch = ({"mixture": x},
                 {"target": gt,
                  "num_target_speakers": np.ones(2, np.int64),
                  "num_interfering_speakers": np.zeros(2, np.int64)})
        loss, _ = module._step(batch, 0, step="train")
        assert np.isfinite(loss)
        bs1 = jax.tree_util.tree_map(
            np.asarray, flax_to_dict(module.model_state))
        moved = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), bs0, bs1)
        assert max(jax.tree_util.tree_leaves(moved)) > 0
        module.dump_state(str(tmp_path / "ck.pt"))
        st = load_checkpoint(tmp_path / "ck.pt")
        assert "model_state" in st


def flax_to_dict(tree):
    return jax.tree_util.tree_map(lambda x: x, dict(tree))
