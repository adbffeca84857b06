"""Pallas TPU kernel: the ENTIRE GridNet block stack in ONE kernel (streaming
T=1, batch=1) — the single-stream latency fast path.

The streaming step's critical path is ~B*(F+1) dependent LSTM cell updates
(B=6 blocks x F=145 intra steps + 1 inter step at the production config —
SURVEY §7 hard-part #2). Run as XLA `lax.scan`s, every cell pays whole-program
loop overhead and every op boundary round-trips activations through HBM. This
kernel keeps the activation tile `x[F, D]`, all six blocks' weights (~2.5 MB),
and the LSTM states resident in VMEM for the whole step:

- intra BLSTM: both directions fused into one F-step `fori_loop` (state
  [1, 2H], recurrent matrix block-diagonal [2H, 8H], gate-major lanes — the
  same packing as ops/pallas/lstm_kernel.py); the backward direction's input
  projections are read at the mirrored index, and its hidden states are
  stored at the mirrored row, so no flips materialize;
- inter LSTM (one step per chunk): all F frequency lanes advance in parallel
  as two MXU matmuls + a vectorized gate sweep;
- FiLM between blocks is a fused multiply-add with precomputed per-block
  [F, D] scale/bias (the distance embedding is fixed per stream).

Covers the FULL config matrix (see runtime/fast_path.py:1-21 for the gate):

- plain and `conv_lstm=True` intra paths (`_kernel` / `_kernel_conv`; the
  conv variant packs the down/up convs as phase-split matmuls);
- `use_attn=True` runs the local attention IN-kernel (`_kernel_attn` /
  `_kernel_conv_attn`): slot-major K/V rings stay resident in VMEM, written
  in place at `pos` via `pl.dslice` — window softmax is permutation-
  invariant over slots, so the ring needs no shift copies; ring wraparound
  parity is tested (tests/test_fast_path.py attn_vmem variants). The path
  is auto-gated on `attn_ring_bytes(cfg, F)` < ~10 MB (the rings share
  ~16 MB/core VMEM with the packed weights and intra scratch); larger
  configs fall back to the per-block-kernel + XLA-attention hybrid.
- look-back (`stft_back_pad > 0`) decoding stays in the XLA ends.

Conv/STFT ends stay in XLA — they are parallel MXU work with no
dependent-chain latency (see runtime/fast_path.py for the full step).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def pack_stack_params(cfg, params):
    """Model params (block{i} subtrees) -> stacked kernel operands.

    Returns a dict of [B, ...] arrays: gate-major fused intra BLSTM weights,
    intra/inter LN affines, projections, inter LSTM weights. For conv_lstm
    configs the intra down/up convs are packed as phase-split matmuls:
    `down_cat [C, s*C]` with column block j holding the stride-phase-j tap
    (so one [F, C] @ down_cat matmul precomputes every frame's taps, and the
    sequential loop only gathers s rows per step), and `up_flat [2H, s*C]`
    (one matmul emits all s output phases per frame).
    """
    B, D, H = cfg.B, cfg.D, cfg.H

    def gather(path):
        out = []
        for i in range(B):
            node = params[f"block{i}"]
            for k in path:
                node = node[k]
            out.append(np.asarray(node, np.float32))
        return jnp.asarray(np.stack(out))

    # fused BLSTM packing: gate g occupies lanes [g*2H, g*2H+H) fwd and
    # [g*2H+H, (g+1)*2H) bwd; recurrent matrix is block-diagonal so the fwd
    # state only drives fwd lanes and vice versa.
    wih_f = np.zeros((B, D, 8 * H), np.float32)
    wih_b = np.zeros((B, D, 8 * H), np.float32)
    whh = np.zeros((B, 2 * H, 8 * H), np.float32)
    b8 = np.zeros((B, 8 * H), np.float32)
    for i in range(B):
        bl = params[f"block{i}"]["intra"]["blstm"]
        for g in range(4):
            lo = g * 2 * H
            sl = slice(g * H, (g + 1) * H)
            wih_f[i, :, lo:lo + H] = np.asarray(bl["fwd"]["w_ih"][:, sl])
            wih_b[i, :, lo + H:lo + 2 * H] = np.asarray(bl["bwd"]["w_ih"][:, sl])
            whh[i, :H, lo:lo + H] = np.asarray(bl["fwd"]["w_hh"][:, sl])
            whh[i, H:, lo + H:lo + 2 * H] = np.asarray(bl["bwd"]["w_hh"][:, sl])
            b8[i, lo:lo + H] = np.asarray(bl["fwd"]["b"][sl])
            b8[i, lo + H:lo + 2 * H] = np.asarray(bl["bwd"]["b"][sl])

    packed = {
        "i_ln": jnp.stack([gather(("intra", "norm", "scale")),
                           gather(("intra", "norm", "bias"))], axis=1),
        "wih_f": jnp.asarray(wih_f),
        "wih_b": jnp.asarray(wih_b),
        "whh": jnp.asarray(whh),
        "b8": jnp.asarray(b8),
        "t_ln": jnp.stack([gather(("inter_norm", "scale")),
                           gather(("inter_norm", "bias"))], axis=1),
        "wih2": gather(("inter_lstm", "w_ih")),
        "whh2": gather(("inter_lstm", "w_hh")),
        "b2": gather(("inter_lstm", "b")),
        "proj2_w": gather(("inter_proj", "kernel")),
        "proj2_b": gather(("inter_proj", "bias")),
    }
    if cfg.conv_lstm:
        s = cfg.lstm_down
        down, downb, upf, upb = [], [], [], []
        for i in range(B):
            ip = params[f"block{i}"]["intra"]
            dk = np.asarray(ip["down"]["kernel"], np.float32)   # [s*C, C]
            # [s*C, C] row j*C+ci -> down_cat[ci, j*C+co]
            down.append(dk.reshape(s, D, D).transpose(1, 0, 2)
                        .reshape(D, s * D))
            downb.append(np.asarray(ip["down"]["bias"], np.float32))
            upf.append(np.asarray(ip["up_kernel"], np.float32)
                       .reshape(2 * H, s * D))                  # [2H, s*C]
            upb.append(np.asarray(ip["up_bias"], np.float32))
        packed["down_cat"] = jnp.asarray(np.stack(down))
        packed["down_b"] = jnp.asarray(np.stack(downb))
        packed["alpha"] = jnp.asarray(np.stack(
            [np.asarray(params[f"block{i}"]["intra"]["act"]["alpha"],
                        np.float32).reshape(1) for i in range(B)]))
        packed["up_flat"] = jnp.asarray(np.stack(upf))
        packed["up_b"] = jnp.asarray(np.stack(upb))
        packed["lstm_down"] = s
    else:
        packed["proj_w"] = gather(("intra", "proj", "kernel"))
        packed["proj_b"] = gather(("intra", "proj", "bias"))
    return packed


def pack_attn_params(cfg, params):
    """Attention weights (block{i}.attn_* subtrees) -> stacked [B, ...] kernel
    operands for the in-kernel local-attention path (`_kernel_attn`).

    Layouts mirror `AttnProj`/`GridNetBlock` (models/tfgridnet/model.py:320-423,
    reference `tfgridnet_causal.py:643-744`): per-proj Linear kernel [D, L*e],
    PReLU alpha [1], per-head LayerNorm affine reshaped row-major to
    [2, F, e] (scale/bias shared across heads — 2-D so `_ln2d` applies it
    without an in-kernel reshape), plus the output Linear/PReLU/LN over F*C
    packed as [2, F, C].
    """
    B = cfg.B
    F = cfg.n_freqs
    vd = cfg.D // cfg.L

    def gather(name, *path):
        out = []
        for i in range(B):
            node = params[f"block{i}"][name]
            for k in path:
                node = node[k]
            out.append(np.asarray(node, np.float32))
        return jnp.asarray(np.stack(out))

    packed = {}
    for tag, width in (("q", cfg.E), ("k", cfg.E), ("v", vd)):
        nm = f"attn_{tag}"
        packed[f"{tag}_w"] = gather(nm, "proj", "kernel")
        packed[f"{tag}_b"] = gather(nm, "proj", "bias")
        packed[f"{tag}_a"] = jnp.asarray(np.stack(
            [np.asarray(params[f"block{i}"][nm]["act"]["alpha"],
                        np.float32).reshape(1) for i in range(B)]))
        packed[f"{tag}_ln"] = jnp.stack(
            [gather(nm, "norm", "scale"), gather(nm, "norm", "bias")],
            axis=1).reshape(B, 2, F, width)
    packed["o_w"] = gather("attn_out_proj", "kernel")
    packed["o_b"] = gather("attn_out_proj", "bias")
    packed["o_a"] = jnp.asarray(np.stack(
        [np.asarray(params[f"block{i}"]["attn_out_act"]["alpha"],
                    np.float32).reshape(1) for i in range(B)]))
    packed["o_ln"] = jnp.stack(
        [gather("attn_out_norm", "scale"), gather("attn_out_norm", "bias")],
        axis=1).reshape(B, 2, F, cfg.D)
    return packed


def _ln(x, s, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _intra_blstm(b, x, i_ln_ref, wih_f_ref, wih_b_ref, whh_ref, b8_ref,
                 proj_w_ref, proj_b_ref, gxf_ref, gxb_ref, yf_ref, yb_ref,
                 f_len, hidden, eps):
    """Fused-direction intra BLSTM over frequency + residual proj (one
    block). x: [F, D] value; returns the updated x."""
    H = hidden
    h2 = 2 * H
    F = f_len
    z = _ln(x, i_ln_ref[b, 0], i_ln_ref[b, 1], eps)
    gxf_ref[:] = (jnp.dot(z, wih_f_ref[b],
                          preferred_element_type=jnp.float32)
                  + b8_ref[b])[:, None, :]         # [F, 1, 8H]
    gxb_ref[:] = jnp.dot(z, wih_b_ref[b],
                         preferred_element_type=jnp.float32)[:, None, :]
    whh_b = whh_ref[b]                             # [2H, 8H]

    def step(f, carry):
        h1, c1 = carry                             # [1, 2H] each
        rev = F - 1 - f
        gates = (gxf_ref[f] + gxb_ref[rev]
                 + jnp.dot(h1, whh_b, preferred_element_type=jnp.float32))
        ig = jax.nn.sigmoid(gates[:, 0:h2])
        fg = jax.nn.sigmoid(gates[:, h2:2 * h2])
        gg = jnp.tanh(gates[:, 2 * h2:3 * h2])
        og = jax.nn.sigmoid(gates[:, 3 * h2:])
        c1 = fg * c1 + ig * gg
        h1 = og * jnp.tanh(c1)
        yf_ref[f] = h1[:, :H]                      # fwd h at row f
        yb_ref[rev] = h1[:, H:]                    # bwd h at mirrored row
        return h1, c1

    zero = jnp.zeros((1, h2), jnp.float32)
    jax.lax.fori_loop(0, F, step, (zero, zero))
    y2h = jnp.concatenate([yf_ref[:][:, 0], yb_ref[:][:, 0]], axis=-1)
    return x + jnp.dot(y2h, proj_w_ref[b],
                       preferred_element_type=jnp.float32) + proj_b_ref[b]


def _inter_step(b, x, t_ln_ref, wih2_ref, whh2_ref, b2_ref, proj2_w_ref,
                proj2_b_ref, h0_ref, c0_ref, h0_out_ref, c0_out_ref,
                hidden, eps):
    """ONE stateful inter-LSTM step, all F frequency lanes in parallel."""
    H = hidden
    z2 = _ln(x, t_ln_ref[b, 0], t_ln_ref[b, 1], eps)
    g2 = (jnp.dot(z2, wih2_ref[b], preferred_element_type=jnp.float32)
          + b2_ref[b]
          + jnp.dot(h0_ref[b], whh2_ref[b],
                    preferred_element_type=jnp.float32))
    i2 = jax.nn.sigmoid(g2[:, 0:H])
    f2 = jax.nn.sigmoid(g2[:, H:2 * H])
    gg2 = jnp.tanh(g2[:, 2 * H:3 * H])
    o2 = jax.nn.sigmoid(g2[:, 3 * H:])
    c_new = f2 * c0_ref[b] + i2 * gg2
    h_new = o2 * jnp.tanh(c_new)
    h0_out_ref[b] = h_new
    c0_out_ref[b] = c_new
    return x + jnp.dot(h_new, proj2_w_ref[b],
                       preferred_element_type=jnp.float32) + proj2_b_ref[b]


def _kernel(x_ref, film_w_ref, film_b_ref, i_ln_ref, wih_f_ref, wih_b_ref,
            whh_ref, b8_ref, proj_w_ref, proj_b_ref, t_ln_ref, wih2_ref,
            whh2_ref, b2_ref, proj2_w_ref, proj2_b_ref, h0_ref, c0_ref,
            x_out_ref, h0_out_ref, c0_out_ref,
            gxf_ref, gxb_ref, yf_ref, yb_ref,
            *, n_blocks, f_len, hidden, use_film, eps):
    x = x_ref[:]                                   # [F, D] lives in VMEM

    for b in range(n_blocks):
        if use_film and b > 0:
            x = x * film_w_ref[b - 1] + film_b_ref[b - 1]
        x = _intra_blstm(b, x, i_ln_ref, wih_f_ref, wih_b_ref, whh_ref,
                         b8_ref, proj_w_ref, proj_b_ref, gxf_ref, gxb_ref,
                         yf_ref, yb_ref, f_len, hidden, eps)
        x = _inter_step(b, x, t_ln_ref, wih2_ref, whh2_ref, b2_ref,
                        proj2_w_ref, proj2_b_ref, h0_ref, c0_ref,
                        h0_out_ref, c0_out_ref, hidden, eps)

    x_out_ref[:] = x


def _prelu_k(z, alpha):
    return jnp.maximum(z, 0.0) + alpha * jnp.minimum(z, 0.0)


def _ln2d(x, s, b, eps):
    """LayerNorm whose statistics span the WHOLE 2-D slab (the model's LN
    over a flattened [1, F*e] row), computed without any reshape: Mosaic
    rejects sublane<->lane shape casts like [145,2]->[1,290] (probed on
    v5e), but scalar full-reduces + a 2-D affine lower fine. `s`/`b` are the
    flat affine params reshaped host-side to x's [F, e] layout."""
    mu = jnp.mean(x)
    var = jnp.mean(jnp.square(x - mu))
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _attn_step(b, x, pos, aref, kring_ref, vring_ref, f_len, heads, e_dim):
    """Local causal attention for one block at streaming T=1, with the K/V
    rings resident in VMEM (`aref` = dict of packed attention operand refs;
    kring/vring: [B, L*e, W, F] / [B, L*vd, W, F] aliased in->out).

    Identical math to GridNetBlock's attn section
    (models/tfgridnet/model.py:407-423, reference `tfgridnet_causal.py:643-744`)
    exploiting two invariances so every op is Mosaic-lowerable (no
    sublane<->lane reshapes, verified by device probes):
      * softmax attention without intra-window positions is permutation-
        invariant over the W slots — the ring is written in place at `pos`
        (no shift copies) and attended in storage order; warmup zero slots
        are attended exactly like the model's zero-initialized K_buf/V_buf.
      * the q.k inner product over the flattened F*e axis is order-
        invariant — K/V are stored as per-(head, channel) COLUMN PLANES
        [W, F] instead of flat [W, F*e] rows, so ring writes are [F,1]->[1,F]
        transposes and scores/values are plain 2-D dots accumulated over the
        e (resp. vd) channel planes.
    """
    import math as _math

    F = f_len
    C = x.shape[-1]
    vd = C // heads
    scale = 1.0 / _math.sqrt(F * e_dim)
    # the model's attention LayerNorms (AttnProj norm / attn_out_norm) use
    # flax LayerNorm's default eps=1e-5, NOT cfg.eps — keep all paths agreeing
    eps = 1e-5
    zq = _prelu_k(jnp.dot(x, aref["q_w"][b],
                          preferred_element_type=jnp.float32) + aref["q_b"][b],
                  aref["q_a"][b][0])
    zk = _prelu_k(jnp.dot(x, aref["k_w"][b],
                          preferred_element_type=jnp.float32) + aref["k_b"][b],
                  aref["k_a"][b][0])
    zv = _prelu_k(jnp.dot(x, aref["v_w"][b],
                          preferred_element_type=jnp.float32) + aref["v_b"][b],
                  aref["v_a"][b][0])
    W = kring_ref.shape[2]
    outs = []
    for h in range(heads):
        # per-head LN over the full [F, e] slab (== the model's LN over the
        # flattened [1, F*e] row); affine packed 2-D by pack_attn_params
        qh = _ln2d(zq[:, h * e_dim:(h + 1) * e_dim],
                   aref["q_ln"][b, 0], aref["q_ln"][b, 1], eps)   # [F, e]
        kh = _ln2d(zk[:, h * e_dim:(h + 1) * e_dim],
                   aref["k_ln"][b, 0], aref["k_ln"][b, 1], eps)
        vh = _ln2d(zv[:, h * vd:(h + 1) * vd],
                   aref["v_ln"][b, 0], aref["v_ln"][b, 1], eps)   # [F, vd]
        for j in range(e_dim):
            kring_ref[b, h * e_dim + j, pl.dslice(pos, 1)] = kh[:, j:j + 1].T
        for j in range(vd):
            vring_ref[b, h * vd + j, pl.dslice(pos, 1)] = vh[:, j:j + 1].T
        # scores: sum the per-plane [1, F] x [W, F] -> [1, W] contractions
        scores = jax.lax.dot_general(
            qh[:, 0:1].T, kring_ref[b, h * e_dim], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for j in range(1, e_dim):
            scores = scores + jax.lax.dot_general(
                qh[:, j:j + 1].T, kring_ref[b, h * e_dim + j],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * scale, axis=-1)           # [1, W]
        rows = jnp.concatenate(
            [jnp.dot(probs, vring_ref[b, h * vd + j],
                     preferred_element_type=jnp.float32)
             for j in range(vd)], axis=0)                         # [vd, F]
        outs.append(rows.T)                                       # [F, vd]
    o = jnp.concatenate(outs, axis=-1)             # [F, C] head-minor
    o = jnp.dot(o, aref["o_w"][b],
                preferred_element_type=jnp.float32) + aref["o_b"][b]
    o = _prelu_k(o, aref["o_a"][b][0])
    o = _ln2d(o, aref["o_ln"][b, 0], aref["o_ln"][b, 1], eps)     # [F, C]
    return x + o


def _kernel_attn(x_ref, film_w_ref, film_b_ref, i_ln_ref, wih_f_ref,
                 wih_b_ref, whh_ref, b8_ref, proj_w_ref, proj_b_ref,
                 t_ln_ref, wih2_ref, whh2_ref, b2_ref, proj2_w_ref,
                 proj2_b_ref,
                 q_w_ref, q_b_ref, q_a_ref, q_ln_ref,
                 k_w_ref, k_b_ref, k_a_ref, k_ln_ref,
                 v_w_ref, v_b_ref, v_a_ref, v_ln_ref,
                 o_w_ref, o_b_ref, o_a_ref, o_ln_ref,
                 h0_ref, c0_ref, kring_in_ref, vring_in_ref, pos_ref,
                 x_out_ref, h0_out_ref, c0_out_ref, kring_ref, vring_ref,
                 gxf_ref, gxb_ref, yf_ref, yb_ref,
                 *, n_blocks, f_len, hidden, heads, e_dim, use_film, eps):
    """`_kernel` + in-kernel local attention per block. The rings arrive as
    aliased in/out operands (kring_in is the same buffer as kring when the
    caller donates; copied once otherwise)."""
    kring_ref[:] = kring_in_ref[:]
    vring_ref[:] = vring_in_ref[:]
    pos = pos_ref[0]
    aref = {"q_w": q_w_ref, "q_b": q_b_ref, "q_a": q_a_ref, "q_ln": q_ln_ref,
            "k_w": k_w_ref, "k_b": k_b_ref, "k_a": k_a_ref, "k_ln": k_ln_ref,
            "v_w": v_w_ref, "v_b": v_b_ref, "v_a": v_a_ref, "v_ln": v_ln_ref,
            "o_w": o_w_ref, "o_b": o_b_ref, "o_a": o_a_ref, "o_ln": o_ln_ref}
    x = x_ref[:]

    for b in range(n_blocks):
        if use_film and b > 0:
            x = x * film_w_ref[b - 1] + film_b_ref[b - 1]
        x = _intra_blstm(b, x, i_ln_ref, wih_f_ref, wih_b_ref, whh_ref,
                         b8_ref, proj_w_ref, proj_b_ref, gxf_ref, gxb_ref,
                         yf_ref, yb_ref, f_len, hidden, eps)
        x = _inter_step(b, x, t_ln_ref, wih2_ref, whh2_ref, b2_ref,
                        proj2_w_ref, proj2_b_ref, h0_ref, c0_ref,
                        h0_out_ref, c0_out_ref, hidden, eps)
        x = _attn_step(b, x, pos, aref, kring_ref, vring_ref, f_len, heads,
                       e_dim)

    x_out_ref[:] = x


def _kernel_conv(x_ref, film_w_ref, film_b_ref, down_cat_ref, down_b_ref,
                 alpha_ref, i_ln_ref, wih_f_ref, wih_b_ref, whh_ref, b8_ref,
                 up_flat_ref, up_b_ref, t_ln_ref, wih2_ref, whh2_ref, b2_ref,
                 proj2_w_ref, proj2_b_ref, h0_ref, c0_ref,
                 x_out_ref, h0_out_ref, c0_out_ref,
                 taps_ref, gxf_ref, gxb_ref, yf_ref, yb_ref,
                 *, n_blocks, f_len, hidden, s, use_film, eps):
    """conv_lstm intra variant (reference `GridNetBlock:800-815`): strided
    Conv1d down -> PReLU -> LN -> BLSTM over k=F//s steps -> ConvTranspose1d
    up -> pad-to-F. The down conv is phase-split (`pack_stack_params`): one
    [F, C] @ [C, s*C] matmul precomputes every frame's taps; each sequential
    step gathers its s rows, so the recurrence is k steps, not F."""
    x = x_ref[:]                                   # [F, D]

    for b in range(n_blocks):
        if use_film and b > 0:
            x = x * film_w_ref[b - 1] + film_b_ref[b - 1]
        x = _intra_conv(b, x, down_cat_ref, down_b_ref, alpha_ref, i_ln_ref,
                        wih_f_ref, wih_b_ref, whh_ref, b8_ref, up_flat_ref,
                        up_b_ref, x_out_ref, taps_ref, gxf_ref, gxb_ref,
                        yf_ref, yb_ref, hidden, s, eps)
        x = _inter_step(b, x, t_ln_ref, wih2_ref, whh2_ref, b2_ref,
                        proj2_w_ref, proj2_b_ref, h0_ref, c0_ref,
                        h0_out_ref, c0_out_ref, hidden, eps)

    x_out_ref[:] = x


def _intra_conv(b, x, down_cat_ref, down_b_ref, alpha_ref, i_ln_ref,
                wih_f_ref, wih_b_ref, whh_ref, b8_ref, up_flat_ref, up_b_ref,
                x_out_ref, taps_ref, gxf_ref, gxb_ref, yf_ref, yb_ref,
                hidden, s, eps):
    """conv_lstm intra for one block (see `_kernel_conv` docstring). Uses
    x_out_ref as the residual-accumulation scratch; returns updated x."""
    H = hidden
    h2 = 2 * H
    F = x.shape[0]
    C = x.shape[-1]
    k = F // s

    taps_ref[:] = jnp.dot(x, down_cat_ref[b],
                          preferred_element_type=jnp.float32)
    alpha = alpha_ref[b][0]
    whh_b = whh_ref[b]

    def gx_step(f, _):
        z = down_b_ref[b][None, :]
        for j in range(s):
            z = z + taps_ref[f * s + j, j * C:(j + 1) * C][None, :]
        z = jnp.maximum(z, 0) + alpha * jnp.minimum(z, 0)
        z = _ln(z, i_ln_ref[b, 0], i_ln_ref[b, 1], eps)
        gxf_ref[f] = (jnp.dot(z, wih_f_ref[b],
                              preferred_element_type=jnp.float32)
                      + b8_ref[b])
        gxb_ref[f] = jnp.dot(z, wih_b_ref[b],
                             preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, k, gx_step, 0)

    def step(f, carry):
        h1, c1 = carry                             # [1, 2H]
        rev = k - 1 - f
        gates = (gxf_ref[f] + gxb_ref[rev]
                 + jnp.dot(h1, whh_b, preferred_element_type=jnp.float32))
        ig = jax.nn.sigmoid(gates[:, 0:h2])
        fg = jax.nn.sigmoid(gates[:, h2:2 * h2])
        gg = jnp.tanh(gates[:, 2 * h2:3 * h2])
        og = jax.nn.sigmoid(gates[:, 3 * h2:])
        c1 = fg * c1 + ig * gg
        h1 = og * jnp.tanh(c1)
        yf_ref[f] = h1[:, :H]
        yb_ref[rev] = h1[:, H:]
        return h1, c1

    zero = jnp.zeros((1, h2), jnp.float32)
    jax.lax.fori_loop(0, k, step, (zero, zero))
    y2h = jnp.concatenate([yf_ref[:][:, 0], yb_ref[:][:, 0]], axis=-1)
    # reuse the taps scratch (free after gx_step) for the up output so
    # the per-row gather below indexes a ref, not a loop-carried value
    taps_ref[0:k] = jnp.dot(y2h, up_flat_ref[b],
                            preferred_element_type=jnp.float32)  # [k, s*C]
    up_b = up_b_ref[b]

    # residual add; rows >= k*s keep x (reference pads zeros `:811-813`)
    x_out_ref[:] = x

    def up_step(f, _):
        for j in range(s):
            x_out_ref[f * s + j] = (
                x_out_ref[f * s + j]
                + taps_ref[f, j * C:(j + 1) * C] + up_b)
        return 0

    jax.lax.fori_loop(0, k, up_step, 0)
    return x_out_ref[:]


def _kernel_conv_attn(x_ref, film_w_ref, film_b_ref, down_cat_ref,
                      down_b_ref, alpha_ref, i_ln_ref, wih_f_ref, wih_b_ref,
                      whh_ref, b8_ref, up_flat_ref, up_b_ref, t_ln_ref,
                      wih2_ref, whh2_ref, b2_ref, proj2_w_ref, proj2_b_ref,
                      q_w_ref, q_b_ref, q_a_ref, q_ln_ref,
                      k_w_ref, k_b_ref, k_a_ref, k_ln_ref,
                      v_w_ref, v_b_ref, v_a_ref, v_ln_ref,
                      o_w_ref, o_b_ref, o_a_ref, o_ln_ref,
                      h0_ref, c0_ref, kring_in_ref, vring_in_ref, pos_ref,
                      x_out_ref, h0_out_ref, c0_out_ref, kring_ref, vring_ref,
                      taps_ref, gxf_ref, gxb_ref, yf_ref, yb_ref,
                      *, n_blocks, f_len, hidden, s, heads, e_dim, use_film,
                      eps):
    """`_kernel_conv` + in-kernel local attention per block."""
    kring_ref[:] = kring_in_ref[:]
    vring_ref[:] = vring_in_ref[:]
    pos = pos_ref[0]
    aref = {"q_w": q_w_ref, "q_b": q_b_ref, "q_a": q_a_ref, "q_ln": q_ln_ref,
            "k_w": k_w_ref, "k_b": k_b_ref, "k_a": k_a_ref, "k_ln": k_ln_ref,
            "v_w": v_w_ref, "v_b": v_b_ref, "v_a": v_a_ref, "v_ln": v_ln_ref,
            "o_w": o_w_ref, "o_b": o_b_ref, "o_a": o_a_ref, "o_ln": o_ln_ref}
    x = x_ref[:]

    for b in range(n_blocks):
        if use_film and b > 0:
            x = x * film_w_ref[b - 1] + film_b_ref[b - 1]
        x = _intra_conv(b, x, down_cat_ref, down_b_ref, alpha_ref, i_ln_ref,
                        wih_f_ref, wih_b_ref, whh_ref, b8_ref, up_flat_ref,
                        up_b_ref, x_out_ref, taps_ref, gxf_ref, gxb_ref,
                        yf_ref, yb_ref, hidden, s, eps)
        x = _inter_step(b, x, t_ln_ref, wih2_ref, whh2_ref, b2_ref,
                        proj2_w_ref, proj2_b_ref, h0_ref, c0_ref,
                        h0_out_ref, c0_out_ref, hidden, eps)
        x = _attn_step(b, x, pos, aref, kring_ref, vring_ref, f_len, heads,
                       e_dim)

    x_out_ref[:] = x


def gridnet_stack_step(packed, x, h0, c0, film_w=None, film_b=None,
                       eps: float = 1e-5, interpret: bool = False):
    """One streaming step of the full block stack.

    x: [F, D] post-conv features for the current chunk; h0/c0: [B, F, H]
    inter-LSTM state; film_w/film_b: [B-1, F, D] precomputed FiLM affines
    (None for unconditional models). Returns (x_out [F, D], h0', c0').
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks, _, hidden4 = packed["wih2"].shape
    hidden = hidden4 // 4
    f_len, d = x.shape
    use_film = film_w is not None
    if not use_film:
        film_w = jnp.zeros((max(n_blocks - 1, 1), f_len, d), jnp.float32)
        film_b = jnp.zeros_like(film_w)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((f_len, d), jnp.float32),
                 jax.ShapeDtypeStruct((n_blocks, f_len, hidden), jnp.float32),
                 jax.ShapeDtypeStruct((n_blocks, f_len, hidden), jnp.float32))

    if "down_cat" in packed:  # conv_lstm intra variant
        s = packed["lstm_down"]
        k = f_len // s
        out = pl.pallas_call(
            functools.partial(_kernel_conv, n_blocks=n_blocks, f_len=f_len,
                              hidden=hidden, s=s, use_film=use_film, eps=eps),
            out_shape=out_shape,
            in_specs=[vmem] * 21,
            out_specs=(vmem, vmem, vmem),
            scratch_shapes=[pltpu.VMEM((f_len, s * d), jnp.float32),
                            pltpu.VMEM((k, 1, 8 * hidden), jnp.float32),
                            pltpu.VMEM((k, 1, 8 * hidden), jnp.float32),
                            pltpu.VMEM((k, 1, hidden), jnp.float32),
                            pltpu.VMEM((k, 1, hidden), jnp.float32)],
            interpret=interpret,
        )(x, film_w, film_b, packed["down_cat"], packed["down_b"],
          packed["alpha"], packed["i_ln"], packed["wih_f"], packed["wih_b"],
          packed["whh"], packed["b8"], packed["up_flat"], packed["up_b"],
          packed["t_ln"], packed["wih2"], packed["whh2"], packed["b2"],
          packed["proj2_w"], packed["proj2_b"], h0, c0)
        return out

    out = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks, f_len=f_len,
                          hidden=hidden, use_film=use_film, eps=eps),
        out_shape=out_shape,
        in_specs=[vmem] * 18,
        out_specs=(vmem, vmem, vmem),
        scratch_shapes=[pltpu.VMEM((f_len, 1, 8 * hidden), jnp.float32),
                        pltpu.VMEM((f_len, 1, 8 * hidden), jnp.float32),
                        pltpu.VMEM((f_len, 1, hidden), jnp.float32),
                        pltpu.VMEM((f_len, 1, hidden), jnp.float32)],
        interpret=interpret,
    )(x, film_w, film_b, packed["i_ln"], packed["wih_f"], packed["wih_b"],
      packed["whh"], packed["b8"], packed["proj_w"], packed["proj_b"],
      packed["t_ln"], packed["wih2"], packed["whh2"], packed["b2"],
      packed["proj2_w"], packed["proj2_b"], h0, c0)
    return out


def attn_ring_bytes(cfg, f_len: int) -> int:
    """fp32 footprint of the whole-stack K/V rings (the VMEM budget gate)."""
    vd = cfg.D // cfg.L
    per_slot = f_len * (cfg.E + vd) * 4
    return cfg.B * cfg.L * cfg.local_atten_len * per_slot


def gridnet_stack_step_attn(packed, packed_attn, x, h0, c0, k_ring, v_ring,
                            pos, heads, film_w=None, film_b=None,
                            eps: float = 1e-5, interpret: bool = False):
    """One streaming step of the full block stack INCLUDING local attention,
    K/V rings resident in VMEM (use_attn=True configs whose rings fit — see
    `attn_ring_bytes`).

    x: [F, D]; h0/c0: [B, F, H]; k_ring/v_ring: [B, L*E, W, F] /
    [B, L*vd, W, F] per-(head, channel) column-plane ring buffers (see
    `_attn_step` for why this layout); pos: [1] int32 current slot; heads:
    cfg.L. Returns (x_out, h0', c0', k_ring', v_ring') — the caller advances
    pos by (pos + 1) % W and should donate the rings (aliased in->out).
    """
    from jax.experimental.pallas import tpu as pltpu

    n_blocks, _, hidden4 = packed["wih2"].shape
    hidden = hidden4 // 4
    f_len, d = x.shape
    e_dim = k_ring.shape[1] // heads
    use_film = film_w is not None
    if not use_film:
        film_w = jnp.zeros((max(n_blocks - 1, 1), f_len, d), jnp.float32)
        film_b = jnp.zeros_like(film_w)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (jax.ShapeDtypeStruct((f_len, d), jnp.float32),
                 jax.ShapeDtypeStruct((n_blocks, f_len, hidden), jnp.float32),
                 jax.ShapeDtypeStruct((n_blocks, f_len, hidden), jnp.float32),
                 jax.ShapeDtypeStruct(k_ring.shape, jnp.float32),
                 jax.ShapeDtypeStruct(v_ring.shape, jnp.float32))
    pa = packed_attn
    attn_ops = (pa["q_w"], pa["q_b"], pa["q_a"], pa["q_ln"],
                pa["k_w"], pa["k_b"], pa["k_a"], pa["k_ln"],
                pa["v_w"], pa["v_b"], pa["v_a"], pa["v_ln"],
                pa["o_w"], pa["o_b"], pa["o_a"], pa["o_ln"])
    state_ops = (h0, c0, k_ring, v_ring, pos)

    if "down_cat" in packed:  # conv_lstm intra variant
        s = packed["lstm_down"]
        k = f_len // s
        operands = ((x, film_w, film_b, packed["down_cat"], packed["down_b"],
                     packed["alpha"], packed["i_ln"], packed["wih_f"],
                     packed["wih_b"], packed["whh"], packed["b8"],
                     packed["up_flat"], packed["up_b"], packed["t_ln"],
                     packed["wih2"], packed["whh2"], packed["b2"],
                     packed["proj2_w"], packed["proj2_b"])
                    + attn_ops + state_ops)
        return pl.pallas_call(
            functools.partial(_kernel_conv_attn, n_blocks=n_blocks,
                              f_len=f_len, hidden=hidden, s=s, heads=heads,
                              e_dim=e_dim, use_film=use_film, eps=eps),
            out_shape=out_shape,
            in_specs=[vmem] * 39 + [smem],
            out_specs=(vmem,) * 5,
            input_output_aliases={37: 3, 38: 4},
            scratch_shapes=[pltpu.VMEM((f_len, s * d), jnp.float32),
                            pltpu.VMEM((k, 1, 8 * hidden), jnp.float32),
                            pltpu.VMEM((k, 1, 8 * hidden), jnp.float32),
                            pltpu.VMEM((k, 1, hidden), jnp.float32),
                            pltpu.VMEM((k, 1, hidden), jnp.float32)],
            interpret=interpret,
        )(*operands)

    operands = ((x, film_w, film_b, packed["i_ln"], packed["wih_f"],
                 packed["wih_b"], packed["whh"], packed["b8"],
                 packed["proj_w"], packed["proj_b"], packed["t_ln"],
                 packed["wih2"], packed["whh2"], packed["b2"],
                 packed["proj2_w"], packed["proj2_b"])
                + attn_ops + state_ops)
    return pl.pallas_call(
        functools.partial(_kernel_attn, n_blocks=n_blocks, f_len=f_len,
                          hidden=hidden, heads=heads, e_dim=e_dim,
                          use_film=use_film, eps=eps),
        out_shape=out_shape,
        in_specs=[vmem] * 36 + [smem],
        out_specs=(vmem,) * 5,
        # the rings are read-modify-write state: alias them onto their
        # outputs so XLA updates in place when the caller donates
        input_output_aliases={34: 3, 35: 4},
        scratch_shapes=[pltpu.VMEM((f_len, 1, 8 * hidden), jnp.float32),
                        pltpu.VMEM((f_len, 1, 8 * hidden), jnp.float32),
                        pltpu.VMEM((f_len, 1, hidden), jnp.float32),
                        pltpu.VMEM((f_len, 1, hidden), jnp.float32)],
        interpret=interpret,
    )(*operands)
