"""Single-stream low-latency streaming: the fused Pallas block stack.

`ModelWrapper` (runtime/streaming.py) runs the model's own forward — correct
for every config, but the block stack becomes ~B*(F+1) XLA-scan LSTM steps
whose loop overhead dominates single-stream latency. `FusedStreamer` runs the
SAME math with the whole stack in one Pallas kernel
(ops/pallas/stack_kernel.py); the STFT/feature/conv ends stay in XLA (they
are parallel MXU work). Every config is covered: non-attention models run
the whole stack in one kernel; `use_attn=True` models ALSO run the whole
stack (attention included) in one kernel with the K/V rings resident in
VMEM when they fit (`attn_ring_bytes` < ~10 MB; slot-major rings written in
place — window softmax is permutation-invariant, so no shift copies), and
otherwise fall back to one kernel per block with the local attention between
kernels in XLA. `SB_FUSED_ATTN=0/1/auto` overrides the ring-budget gate.
Output parity with the model forward is tested to 1e-4
(tests/test_fast_path.py, incl. ring wraparound).

Device-compiled proof (round 4, TPU v5e): the in-kernel attention path's
Mosaic lowering was probed op-by-op — sublane<->lane reshapes like
[F, e] -> [1, F*e] are REJECTED by Mosaic, so the kernel stores K/V as
per-(head, channel) column planes [W, F] and computes the flattened-row
LayerNorms as whole-slab statistics (stack_kernel._ln2d / _attn_step).
Compiled smoke on the real chip (L=4 heads, 10 chunks incl. ring
wraparound): matches the XLA model forward to rel 5.6e-3 (bf16 matmul
tolerance) — the auto-gate is safe to leave on for serving.

Reference anchor: this replaces the reference's per-chunk ONNX/TFLite loop
(`/root/reference/edge/causal_infer.py:75-87`) as the latency-serving path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import (
    AttnProj, CausalConv2d, CausalDeconv2d, DisEmbed, LayerNorm, Linear,
    PReLU, _local_attention, init_state,
)
from sound_bubble_tpu.ops.features import spatial_features
from sound_bubble_tpu.ops.pallas.stack_kernel import (
    attn_ring_bytes, gridnet_stack_step, gridnet_stack_step_attn,
    pack_attn_params, pack_stack_params,
)
from sound_bubble_tpu.ops.stft import istft, make_stft, stft


class FusedStreamer:
    """Stateful single-stream streaming wrapper (batch=1) on the fused
    kernel. Same `feed(window)` contract as ModelWrapper."""

    # VMEM budget for the in-kernel attention rings (the ~16 MB/core VMEM
    # also holds the packed weights and the intra scratch)
    _RING_BUDGET_BYTES = 10 * 2 ** 20

    def __init__(self, net, params, dis_embed=None, interpret: bool = False,
                 attn_in_kernel: bool | None = None):
        import os

        cfg = net.cfg
        self.cfg = cfg
        self._params = params
        self._interpret = interpret
        self._packed = pack_stack_params(cfg, params)
        if attn_in_kernel is None:
            env = os.environ.get("SB_FUSED_ATTN", "auto")
            attn_in_kernel = (env != "0") and (
                env == "1"
                or attn_ring_bytes(cfg, cfg.n_freqs) < self._RING_BUDGET_BYTES)
        self._attn_in_kernel = cfg.use_attn and attn_in_kernel
        self._packed_attn = (pack_attn_params(cfg, params)
                             if self._attn_in_kernel else None)
        self._film = self._precompute_film(dis_embed)
        self.internal_state = None
        self._step = jax.jit(self._step_impl, donate_argnums=(1,))

    def _precompute_film(self, dis_embed):
        cfg, params = self.cfg, self._params
        if not cfg.conditional:
            return None
        if dis_embed is None:
            dis_embed = jnp.asarray([[0.0, 0.0, 1.0]])
        dis_embed = jnp.asarray(np.asarray(dis_embed, np.float32))
        emb = DisEmbed(cfg).apply(
            {"params": params["dis_embed"]}, dis_embed)     # [1, F, d_in]
        ws, bs = [], []
        for i in range(cfg.B - 1):
            fp = params[f"film{i}"]
            ws.append(Linear(cfg.D).apply({"params": fp["weight"]}, emb)[0])
            bs.append(Linear(cfg.D).apply({"params": fp["bias"]}, emb)[0])
        return jnp.stack(ws), jnp.stack(bs)                 # [B-1, F, D] x2

    def set_dis_embed(self, dis_embed):
        self._film = self._precompute_film(dis_embed)

    def _attention(self, x, i, buf):
        """Local causal attention for block i at streaming T=1 — the same
        math as GridNetBlock's attn section (models/tfgridnet/model.py:407-423,
        reference `tfgridnet_causal.py:643-744`). x: [F, C] post-inter
        features; buf holds the block's K_buf/V_buf rings. Returns
        (x', {'K_buf': ..., 'V_buf': ...})."""
        cfg, params = self.cfg, self._params
        bp = params[f"block{i}"]
        F, C = x.shape
        W, vd = cfg.local_atten_len, C // cfg.L
        xa = x[None, None]                               # [1, 1, F, C]
        q = AttnProj(cfg.L, cfg.E).apply({"params": bp["attn_q"]}, xa)
        k = AttnProj(cfg.L, cfg.E).apply({"params": bp["attn_k"]}, xa)
        v = AttnProj(cfg.L, vd).apply({"params": bp["attn_v"]}, xa)
        k_full = jnp.concatenate([buf["K_buf"], k], axis=2)  # [1, L, W, F*E]
        v_full = jnp.concatenate([buf["V_buf"], v], axis=2)
        o = _local_attention(q, k_full, v_full, W)       # [1, L, 1, F*vd]
        o = o.reshape(1, cfg.L, 1, F, vd)
        o = o.transpose(0, 2, 3, 1, 4).reshape(1, 1, F, C)
        o = Linear(C).apply({"params": bp["attn_out_proj"]}, o)
        o = PReLU().apply({"params": bp["attn_out_act"]}, o)
        o = LayerNorm(F * C).apply({"params": bp["attn_out_norm"]},
                                   o.reshape(1, 1, F * C))
        return (x + o.reshape(F, C),
                {"K_buf": k_full[:, :, -(W - 1):],
                 "V_buf": v_full[:, :, -(W - 1):]})

    def reset(self):
        self.internal_state = None

    def _make_state(self):
        """Model init_state, plus slot-major K/V ring buffers + position when
        the attention runs inside the kernel (the per-block K_buf/V_buf shift
        buffers in the model layout are ignored on that path — output parity
        is what's tested, the flatbuf export keeps using ModelWrapper)."""
        cfg = self.cfg
        state = init_state(cfg, 1)
        if self._attn_in_kernel:
            F, W = cfg.n_freqs, cfg.local_atten_len
            for i in range(cfg.B):
                b = dict(state["gridnet_bufs"][f"buf{i}"])
                b.pop("K_buf", None)
                b.pop("V_buf", None)
                state["gridnet_bufs"][f"buf{i}"] = b
            # per-(head, channel) column planes — see stack_kernel._attn_step
            state["k_ring"] = jnp.zeros(
                (cfg.B, cfg.L * cfg.E, W, F), jnp.float32)
            state["v_ring"] = jnp.zeros(
                (cfg.B, cfg.D, W, F), jnp.float32)  # L * (D//L) == D planes
            state["attn_pos"] = jnp.zeros((1,), jnp.int32)
        return state

    def _step_impl(self, window, state, film):
        """window: [1, M, chunk+pad] -> (out [1, num_src, chunk], state')."""
        cfg, params = self.cfg, self._params
        fb = make_stft(cfg.n_fft, cfg.stft_chunk_size)
        F = cfg.n_freqs
        next_state = dict(state)

        spec = stft(fb, window)                      # [1, M, 1, 2F]
        real, imag = spec[..., :F], spec[..., F:]
        base = jnp.moveaxis(jnp.concatenate([real, imag], axis=1), 1, -1)
        if cfg.merge_method == "early_cat":
            feat = jnp.concatenate(
                [base, spatial_features(real, imag, cfg.directional)], axis=-1)
        else:
            feat = base                              # [1, 1, F, Cin]

        full = jnp.concatenate([state["conv_buf"], feat], axis=1)
        next_state["conv_buf"] = full[:, -2:]
        h = CausalConv2d(cfg.D).apply({"params": params["conv"]}, full)
        if cfg.use_first_ln:
            h = LayerNorm(cfg.D).apply({"params": params["first_ln"]}, h)

        h0 = jnp.stack([state["gridnet_bufs"][f"buf{i}"]["h0"][0]
                        for i in range(cfg.B)])      # [B, F, H]
        c0 = jnp.stack([state["gridnet_bufs"][f"buf{i}"]["c0"][0]
                        for i in range(cfg.B)])
        fw, fb_ = film if film is not None else (None, None)
        if not cfg.use_attn:
            x, h0n, c0n = gridnet_stack_step(
                self._packed, h[0, 0], h0, c0, fw, fb_, eps=cfg.eps,
                interpret=self._interpret)
            next_state["gridnet_bufs"] = {
                f"buf{i}": {"h0": h0n[i][None], "c0": c0n[i][None]}
                for i in range(cfg.B)}
        elif self._attn_in_kernel:
            # whole stack incl. attention in ONE kernel, K/V rings in VMEM
            x, h0n, c0n, krn, vrn = gridnet_stack_step_attn(
                self._packed, self._packed_attn, h[0, 0], h0, c0,
                state["k_ring"], state["v_ring"], state["attn_pos"],
                cfg.L, fw, fb_, eps=cfg.eps, interpret=self._interpret)
            next_state["gridnet_bufs"] = {
                f"buf{i}": {"h0": h0n[i][None], "c0": c0n[i][None]}
                for i in range(cfg.B)}
            next_state["k_ring"] = krn
            next_state["v_ring"] = vrn
            next_state["attn_pos"] = (
                (state["attn_pos"] + 1) % cfg.local_atten_len)
        else:
            # attention configs: per-block fused kernel for the sequential
            # intra/inter chains; the K/V rings (too large for VMEM across
            # blocks) and the attention itself — parallel MXU matmuls with
            # no dependent chain — stay in XLA between kernel calls.
            x = h[0, 0]
            new_bufs = {}
            for i in range(cfg.B):
                if i > 0 and film is not None:
                    x = x * fw[i - 1] + fb_[i - 1]
                pk = {k: (v if k == "lstm_down" else v[i:i + 1])
                      for k, v in self._packed.items()}
                x, h0b, c0b = gridnet_stack_step(
                    pk, x, h0[i:i + 1], c0[i:i + 1], None, None,
                    eps=cfg.eps, interpret=self._interpret)
                x, buf_i = self._attention(x, i,
                                           state["gridnet_bufs"][f"buf{i}"])
                buf_i["h0"], buf_i["c0"] = h0b, c0b
                new_bufs[f"buf{i}"] = buf_i
            next_state["gridnet_bufs"] = new_bufs

        hfull = jnp.concatenate([state["deconv_buf"], x[None, None]], axis=1)
        next_state["deconv_buf"] = hfull[:, -2:]
        out = CausalDeconv2d(cfg.num_src * 2).apply(
            {"params": params["deconv"]}, hfull)     # [1, 1, F, 2*num_src]
        out = out.reshape(1, 1, F, cfg.num_src, 2)
        est = jnp.concatenate(
            [out[..., 0].transpose(0, 3, 1, 2),
             out[..., 1].transpose(0, 3, 1, 2)], axis=-1)   # [1, S, 1, 2F]
        if cfg.spectral_masking:
            est = est * spec[:, :cfg.num_src]

        full_spec = jnp.concatenate([state["istft_buf"], est], axis=2)
        next_state["istft_buf"] = full_spec[:, :, -cfg.istft_lookback:]
        chunk = cfg.stft_chunk_size
        if cfg.stft_back_pad == 0:
            y = istft(fb, full_spec)
            y = y[..., :-(cfg.n_fft - chunk)]
            y = y[..., cfg.istft_lookback * chunk:]
        else:
            # look-back causal_decoder, streaming T=1 (model.py `_core`
            # back_pad branch; reference `tfgridnet_causal.py:423-431`)
            B2, S2, Tp, _ = full_spec.shape
            frames = (full_spec.reshape(-1, 2 * F) @ fb.filters)
            frames = frames.reshape(B2, S2, Tp, cfg.n_fft)
            frames = frames[..., cfg.stft_back_pad:]
            la = cfg.n_fft - chunk
            head = frames[:, :, -1, :chunk]
            prev_tail = frames[:, :, -2, -la:]
            y = head.at[..., :min(la, chunk)].add(
                prev_tail[..., :min(la, chunk)])
        return y, next_state

    def feed(self, window):
        window = jnp.asarray(np.asarray(window, np.float32))
        if self.internal_state is None:
            self.internal_state = self._make_state()
        out, self.internal_state = self._step(window, self.internal_state,
                                              self._film)
        return out


def fused_scan_stream(net, params, windows, dis_embed=None,
                      interpret: bool = False):
    """Whole-signal fused streaming in ONE device dispatch (the measurement
    harness for bench.py): windows [n_chunks, 1, M, chunk+pad] chained with
    lax.scan through the fused step."""
    fs = FusedStreamer(net, params, dis_embed, interpret=interpret)
    state0 = fs._make_state()

    def body(st, win):
        y, st2 = fs._step_impl(win, st, fs._film)
        return st2, y

    def run(windows, state):
        return jax.lax.scan(body, state, windows)

    _, ys = jax.jit(run)(windows, state0)
    # ys: [n_chunks, 1, S, chunk] -> [1, S, n_chunks*chunk]
    return jnp.moveaxis(ys, 0, 2).reshape(ys.shape[1], ys.shape[2], -1)
