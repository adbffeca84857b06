"""LSTM primitives with PyTorch cell semantics, built for the TPU.

The reference's hot path is two LSTMs per GridNet block
(`/root/reference/src/models/tfgridnet_realtime_clean_dis_embd3/tfgridnet_causal.py:566-902`):
a bidirectional LSTM over the frequency axis and a stateful unidirectional
LSTM over time. TPU-first design:

- the input projection `x @ W_ih + b` is hoisted OUT of the recurrence and
  computed for all timesteps in one large matmul (MXU), so the `lax.scan`
  carries only the `h @ W_hh` recurrence (the irreducibly sequential part);
- gate order is PyTorch's `[i, f, g, o]` and both biases are kept, so torch
  checkpoints/tests map 1:1;
- weights are stored transposed (`[in, 4H]`, `[H, 4H]`) for right-matmuls on
  channel-minor activations.

Params pytree per direction: {"w_ih": [C,4H], "w_hh": [H,4H], "b": [4H]}
(`b` is b_ih + b_hh folded together; torch keeps them separate only for CUDNN
compatibility, the math is identical — tests fold torch's two biases).
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from sound_bubble_tpu.ops.init import uniform_fan

# scan unroll factor: 1 measured fastest on TPU v5e (see bench.py history)
_UNROLL = int(os.environ.get("SB_LSTM_UNROLL", "1"))
# mixed-precision cells: run the gate sigmoids/tanh in bf16 (2 lanes/elem on
# the VPU) while the cell state stays fp32. The gate transcendentals are a
# large share of train-step time (bench 2026-08-17).
_BF16_GATES = os.environ.get("SB_LSTM_BF16_GATES", "1") == "1"
# opt-in hand-written LSTM VJP (training): saves only (h_seq, c_seq) as
# residuals and hoists the dW_hh reduction OUT of the backward scan into one
# large matmul — XLA's scan autodiff runs a weight-gradient matmul inside
# every backward step. Grad-checked against autodiff (tests/test_rnn.py).
_CUSTOM_VJP = os.environ.get("SB_LSTM_CUSTOM_VJP", "0") == "1"
# opt-in Pallas training recurrence (implies the custom VJP): the fwd/bwd
# scans run as single fused kernels with (h, c) resident in VMEM
# (ops/pallas/lstm_train_kernel.py); weight grads stay as one large matmul.
_PALLAS_TRAIN = os.environ.get("SB_LSTM_PALLAS_TRAIN", "0") == "1"
# fused-scan training path: gates are computed INSIDE the scan from x (no
# [T, rows, 4H] gates_x materialization in forward OR backward), the weight
# gradients accumulate in the backward scan carry instead of stacking a
# [T, rows, 4H] dgates_seq for post-scan matmuls, and the BLSTM backward
# direction runs as lax.scan(reverse=True) instead of two jnp.flip copies.
# DEFAULT ON since round 4: measured 1.6x the autodiff step on TPU v5e
# (157 vs 254 ms production step, chunk sweep below); exact same math/grads
# (tests/test_rnn.py pins both paths to 1e-5). SB_LSTM_FUSED=0 opts out.
_FUSED_SCAN = os.environ.get("SB_LSTM_FUSED", "1") == "1"
# frames per while-iteration in the fused scans. The train step is
# ITERATION-COUNT-bound, not FLOP- or bandwidth-bound: xprof on the
# production step (2026-08-17, batch 8 bf16, 54 scans x ~200-313 frames =
# ~10.9k sequential while-iterations) shows 99.6 ms/step of while-loop
# self-overhead (~9 us/iteration) plus ~34 ms of per-iteration carry copies
# and output dynamic-update-slices. Blocking K frames into one iteration
# (inner trace-time-unrolled loop, outputs written as one [K, ...] slab)
# divides all three by K while keeping the math identical. TPU v5e sweep
# (2026-08-17, production step, batch 8 bf16, ms/step): K=1 255.9, K=4 181.0,
# K=6 157.2, K=8 163.9, K=10 169.2, K=12 202.4, K=16 194.2 — larger K grows
# the unrolled body (register/VMEM pressure) faster than it saves overhead.
_FUSED_CHUNK = int(os.environ.get("SB_LSTM_CHUNK", "6"))
# backward-scan chunk; the bwd body is ~3x the fwd body (gate recompute +
# 3 matmuls + 2 weight-grad einsums), so its unroll/VMEM-pressure optimum
# sits ABOVE the forward's once the h_prev stream is gone (lighter stacking
# per frame). TPU v5e production-step sweep (2026-08-19, batch 8 bf16,
# fwd chunk 6, runs/sweep_r4b.jsonl): bwd 6 150.8 ms, 8 149.7, 10 149.0,
# 12 174.7 (VMEM spill cliff) — default 10. "0" falls back to the fwd chunk.
_FUSED_CHUNK_BWD = int(os.environ.get("SB_LSTM_CHUNK_BWD", "10")) or None
# direction-fused BLSTM scans: both directions of a bidirectional layer run
# in ONE chunked scan (a leading direction axis on weights/activations turns
# the per-step projections into single batched matmuls), halving the
# while-iteration count of every intra-frequency BLSTM vs the two-scan
# fused path. Opt-in until TPU-benched (sweep via tools/train_sweep.py).
_DIR_FUSE = os.environ.get("SB_BLSTM_DIRFUSE", "0") == "1"
# slab-grid Pallas training scans (ops/pallas/lstm_train_slab.py): the
# fused-scan math with the XLA while-loop replaced by a Pallas grid — carry,
# cotangents AND weight-grad accumulators live in VMEM across the whole
# sequence, the backward's gate recompute batches K frames into two MXU
# matmuls, and c is checkpointed once per K-frame slab instead of stacked
# per frame. TPU v5e production-step sweep (2026-08-19,
# runs/sweep_r4d_slab.jsonl, batch 8 bf16): slab K=8 128.7 ms (155x ingest)
# vs 150.8 fused-scan best — measured-best, so the DEFAULT on TPU ("auto").
# CPU keeps the fused scan (the slab kernels are Mosaic-compiled; interpret
# mode is test-only). SB_LSTM_SLAB=1/0 forces either way.
_SLAB_ENV = os.environ.get("SB_LSTM_SLAB", "auto")
_SLAB = None if _SLAB_ENV == "auto" else _SLAB_ENV == "1"


def _slab_route(mixed: bool) -> bool:
    """Whether _run_fused routes through the slab kernels. SB_LSTM_SLAB=1/0
    (or set_slab) forces either way for any dtype; "auto" engages exactly
    the measured regime — bf16/mixed trunk on a single-device TPU process.
    f32 forwards (eval CLIs, the driver's compile check) and multi-device
    processes keep the fused scan until those combinations are
    device-validated (the hermetic dryrun runs on CPU, so slab-under-pjit
    has never executed; the slab kernels have only been Mosaic-compiled at
    bf16 training shapes)."""
    if _SLAB is not None:
        return _SLAB
    return (mixed and jax.default_backend() == "tpu"
            and jax.device_count() == 1)


def set_custom_vjp(flag: bool):
    global _CUSTOM_VJP
    _CUSTOM_VJP = flag


def set_pallas_train(flag: bool):
    global _PALLAS_TRAIN
    if flag:
        global _CUSTOM_VJP
        _CUSTOM_VJP = True
    _PALLAS_TRAIN = flag


def set_fused_scan(flag: bool):
    global _FUSED_SCAN
    _FUSED_SCAN = flag


def set_dir_fuse(flag: bool):
    global _DIR_FUSE
    _DIR_FUSE = flag


def set_slab(flag: bool):
    global _SLAB
    _SLAB = flag


def _cvjp_impl():
    """The active custom-VJP LSTM core (scan-based or Pallas-fused)."""
    if _PALLAS_TRAIN and _BF16_GATES:
        from sound_bubble_tpu.ops.pallas.lstm_train_kernel import (
            lstm_pallas_train)
        return lstm_pallas_train
    return lstm_cvjp


def _run_cvjp(w_ih, w_hh, b, x_t, h0, c0):
    """Apply the custom-VJP core to scan-major x [T, lead..., C],
    flattening the lead dims to one row axis for the Pallas kernel."""
    impl = _cvjp_impl()
    if impl is lstm_cvjp or x_t.ndim == 3:
        return impl(w_ih, w_hh, b, x_t, h0, c0)
    t = x_t.shape[0]
    lead = x_t.shape[1:-1]
    r = math.prod(lead)
    ys, hT, cT = impl(w_ih, w_hh, b, x_t.reshape(t, r, x_t.shape[-1]),
                      h0.reshape(r, -1), c0.reshape(r, -1))
    return (ys.reshape((t,) + lead + (-1,)), hT.reshape(lead + (-1,)),
            cT.reshape(lead + (-1,)))
# opt-in fused Pallas BLSTM kernel (inference; TPU only)
_PALLAS_BLSTM = os.environ.get("SB_PALLAS_BLSTM", "0") == "1"


def set_pallas_blstm(flag: bool):
    global _PALLAS_BLSTM
    _PALLAS_BLSTM = flag


def init_lstm_params(key, in_dim: int, hidden: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": uniform_fan(k1, (in_dim, 4 * hidden), hidden, dtype),
        "w_hh": uniform_fan(k2, (hidden, 4 * hidden), hidden, dtype),
        # two torch biases folded into one (sum of two U(-b,b) draws)
        "b": uniform_fan(k3, (4 * hidden,), hidden, dtype)
        + uniform_fan(k4, (4 * hidden,), hidden, dtype),
    }


def _cell(h, c, gates_x, w_hh, hidden):
    """One LSTM step. gates_x = x@W_ih + b precomputed. [B..., 4H].

    Mixed precision: when the weights are bf16 but the carry is fp32, the
    recurrence matmul runs on the MXU in bf16 with fp32 accumulation while
    the gate nonlinearities and the (h, c) carry stay fp32 — the cell state
    is a long-horizon accumulator and loses training signal in bf16.
    """
    if w_hh.dtype != h.dtype:
        gates = gates_x.astype(jnp.float32) + jnp.matmul(
            h.astype(w_hh.dtype), w_hh, preferred_element_type=jnp.float32)
        if _BF16_GATES:
            gates = gates.astype(jnp.bfloat16)
    else:
        gates = gates_x + h @ w_hh
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden:])
    c = (f * c).astype(c.dtype) + i * g
    h = o * jnp.tanh(c.astype(gates.dtype))
    h = h.astype(jnp.float32) if h.dtype != c.dtype else h
    return h, c


def lstm(params, x, h0=None, c0=None, reverse: bool = False,
         unroll: int | None = None):
    """Run an LSTM along axis -2 of `x`.

    Args:
      params: {"w_ih","w_hh","b"}.
      x: [..., T, C] inputs.
      h0, c0: [..., H] initial state (zeros if None).
      reverse: scan right-to-left (for the backward half of a BLSTM).
      unroll: scan unroll factor (amortizes XLA loop overhead on TPU).

    Returns: (y [..., T, H], (hT, cT) [..., H]).
    """
    hidden = params["w_hh"].shape[0]
    gates_x = x @ params["w_ih"] + params["b"]  # [..., T, 4H] one big matmul
    lead = x.shape[:-2]
    # bf16 anywhere (weights at apply, or activations at init time when the
    # params are still fp32) -> fp32 carry
    mixed = (params["w_hh"].dtype == jnp.bfloat16
             or x.dtype == jnp.bfloat16)
    carry_dtype = jnp.float32 if mixed else x.dtype
    state_dtype = x.dtype if h0 is None else h0.dtype
    if h0 is None:
        h0 = jnp.zeros(lead + (hidden,), carry_dtype)
    if c0 is None:
        c0 = jnp.zeros(lead + (hidden,), carry_dtype)
    h0, c0 = h0.astype(carry_dtype), c0.astype(carry_dtype)

    if x.shape[-2] == 1:
        # streaming fast path: a single cell update, no scan machinery
        h1, c1 = _cell(h0, c0, gates_x[..., 0, :], params["w_hh"], hidden)
        return (h1.astype(x.dtype)[..., None, :],
                (h1.astype(state_dtype), c1.astype(state_dtype)))

    if _FUSED_SCAN:
        y, hT, cT = _run_fused(params, x, h0, c0, reverse)
        return y, (hT.astype(state_dtype), cT.astype(state_dtype))

    if _CUSTOM_VJP and not reverse:
        x_t = jnp.moveaxis(x, -2, 0)     # [T, ..., C] scan-major
        ys, hT, cT = _run_cvjp(params["w_ih"], params["w_hh"], params["b"],
                               x_t, h0, c0)
        return (jnp.moveaxis(ys, 0, -2),
                (hT.astype(state_dtype), cT.astype(state_dtype)))

    def step(carry, gx):
        h, c = carry
        h, c = _cell(h, c, gx, params["w_hh"], hidden)
        return (h, c), h.astype(x.dtype)

    unroll = _UNROLL if unroll is None else unroll
    gx_t = jnp.moveaxis(gates_x, -2, 0)  # [T, ..., 4H] scan-major
    (hT, cT), ys = jax.lax.scan(step, (h0, c0), gx_t, reverse=reverse,
                                unroll=min(unroll, x.shape[-2]))
    y = jnp.moveaxis(ys, 0, -2)
    return y, (hT.astype(state_dtype), cT.astype(state_dtype))


# ------------------------- custom-VJP LSTM core -------------------------
#
# One direction, scan over axis 0 of gates-major inputs. The forward is
# numerically IDENTICAL to the lax.scan path above (same mixed-precision
# casts); the backward differs from XLA's scan autodiff in two ways:
#   1. residuals are only (h_seq, c_seq) — gates are recomputed from them
#      (one small matmul per backward step, vs saving 4H activations);
#   2. dW_hh = h_prevᵀ @ dgates is ONE large MXU matmul after the backward
#      scan instead of a rank-update inside every sequential step.


def _gate_fwd(gx_t, h_prev, c_prev, w_hh, hidden, mixed):
    """Recompute one step's gate activations exactly as the primal did.
    Returns (i, f, g, o, c_t, h_t)."""
    if mixed:
        g_pre = gx_t.astype(jnp.float32) + jnp.matmul(
            h_prev.astype(w_hh.dtype), w_hh,
            preferred_element_type=jnp.float32)
        if _BF16_GATES:
            g_pre = g_pre.astype(jnp.bfloat16)
    else:
        g_pre = gx_t + h_prev @ w_hh
    i = jax.nn.sigmoid(g_pre[..., :hidden])
    f = jax.nn.sigmoid(g_pre[..., hidden:2 * hidden])
    g = jnp.tanh(g_pre[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(g_pre[..., 3 * hidden:])
    c_t = (f * c_prev).astype(c_prev.dtype) + i * g
    h_t = o * jnp.tanh(c_t.astype(g_pre.dtype))
    return i, f, g, o, c_t, h_t


def _lstm_core(w_ih, w_hh, b, x, h0, c0):
    """(y [T, ..., H] in x.dtype, hT, cT) — scan-major x [T, ..., C]."""
    hidden = w_hh.shape[0]
    mixed = w_hh.dtype == jnp.bfloat16 or x.dtype == jnp.bfloat16
    gates_x = x @ w_ih + b

    def step(carry, gx):
        h, c = carry
        *_, c_t, h_t = _gate_fwd(gx, h, c, w_hh, hidden, mixed)
        h_t = h_t.astype(h.dtype)
        # residual h in the recurrence-matmul dtype (exact: bf16 h round-
        # trips through the f32 carry); c must stay full precision
        return (h_t, c_t), (h_t.astype(x.dtype), h_t.astype(w_hh.dtype), c_t)

    (hT, cT), (ys, h_seq, c_seq) = jax.lax.scan(step, (h0, c0), gates_x)
    return (ys, hT, cT), (h_seq, c_seq)


@jax.custom_vjp
def lstm_cvjp(w_ih, w_hh, b, x, h0, c0):
    out, _ = _lstm_core(w_ih, w_hh, b, x, h0, c0)
    return out


def _lstm_cvjp_fwd(w_ih, w_hh, b, x, h0, c0):
    out, (h_seq, c_seq) = _lstm_core(w_ih, w_hh, b, x, h0, c0)
    return out, (w_ih, w_hh, b, x, h0, c0, h_seq, c_seq)


def _lstm_cvjp_bwd(res, cts):
    w_ih, w_hh, b, x, h0, c0, h_seq, c_seq = res
    dy, dhT, dcT = cts
    hidden = w_hh.shape[0]
    mixed = w_hh.dtype == jnp.bfloat16 or x.dtype == jnp.bfloat16
    f32 = jnp.float32
    # shifted-by-one state sequences (value entering step t); h in the
    # matmul dtype like the saved residuals
    h_prev = jnp.concatenate([h0[None].astype(h_seq.dtype), h_seq[:-1]],
                             axis=0)
    c_prev = jnp.concatenate([c0[None].astype(c_seq.dtype), c_seq[:-1]],
                             axis=0)
    gates_x = x @ w_ih + b              # recomputed, not saved

    w_hh_t = w_hh.T

    gdt = jnp.bfloat16 if (mixed and _BF16_GATES) else x.dtype

    def step(carry, inp):
        dh_next, dc_next = carry        # f32 cotangents
        gx_t, hp, cp, c_t, dy_t = inp
        i, f, g, o, _, _ = _gate_fwd(gx_t, hp, cp, w_hh, hidden, mixed)
        i, f, g, o = (a.astype(f32) for a in (i, f, g, o))
        # primal evaluated tanh on the gdt-cast cell state — recompute at
        # the same point so the backward differentiates the actual primal
        tc = jnp.tanh(c_t.astype(gdt)).astype(f32)
        dh = dy_t.astype(f32) + dh_next
        do = dh * tc
        dc = dc_next + dh * o * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * g * i * (1.0 - i),
            dc * cp.astype(f32) * f * (1.0 - f),
            dc * i * (1.0 - g * g),
            do * o * (1.0 - o)], axis=-1)
        if mixed:
            dh_prev = jnp.matmul(dgates.astype(w_hh.dtype), w_hh_t,
                                 preferred_element_type=f32)
        else:
            dh_prev = dgates @ w_hh_t
        dc_prev = dc * f
        return (dh_prev, dc_prev), dgates.astype(x.dtype)

    init = (dhT.astype(f32), dcT.astype(f32))
    inputs = (gates_x, h_prev, c_prev, c_seq, dy)
    (dh0, dc0), dgates_seq = jax.lax.scan(step, init, inputs, reverse=True)

    # weight/input gradients as single large matmuls (the win vs scan AD)
    dgf = dgates_seq.reshape(-1, 4 * hidden)
    dw_hh = jnp.matmul(
        h_prev.reshape(-1, hidden).T.astype(dgates_seq.dtype), dgf,
        preferred_element_type=f32).astype(w_hh.dtype)
    dw_ih = jnp.matmul(
        x.reshape(-1, x.shape[-1]).T, dgf,
        preferred_element_type=f32).astype(w_ih.dtype)
    db = jnp.sum(dgf.astype(f32), axis=0).astype(b.dtype)
    dx = jnp.matmul(dgates_seq, w_ih.T,
                    preferred_element_type=f32).astype(x.dtype)
    return (dw_ih, dw_hh, db, dx, dh0.astype(h0.dtype), dc0.astype(c0.dtype))


lstm_cvjp.defvjp(_lstm_cvjp_fwd, _lstm_cvjp_bwd)


# ------------------------- fused-scan LSTM core -------------------------
#
# One direction over scan-major x [T, R, C]. Numerically the same primal as
# lstm()/lstm_cvjp (the hoisted x@W_ih+b is re-associated into the step, the
# gate math is identical), but built to minimize the scan's HBM stacking
# traffic, which dominates the train step on TPU:
#   fwd:  reads x (C channels/step, not 4H gates), stacks y [bf16] plus ONE
#         residual stream (c_prev [f32]). The h_prev residual is NOT stacked:
#         h_prev[t] == ys[t-1] exactly (the gate-dtype h round-trips the f32
#         carry and the x-dtype output losslessly whenever the gate dtype is
#         bf16 — the default — or everything is f32), so the backward
#         reconstructs it with one contiguous shift-concat instead of the
#         forward paying a third per-step dynamic-update-slice stream;
#   bwd:  reads (x, h_prev, c_prev, dy), recomputes the gates per step, and
#         carries f32 (dW_ih, dW_hh, db) ACCUMULATORS through the scan —
#         no [T, R, 4H] dgates stacking, the only stacked output is dx.
# `reverse` also removes the two jnp.flip copies per BLSTM direction.
# In the one lossy corner (mixed precision with SB_LSTM_BF16_GATES=0 and
# bf16 activations: f32 gates but bf16 ys) the forward still stacks h_prev
# explicitly so the reconstruction stays exact.


def _fused_gate_fwd(x_t, h, c, w_ih, w_hh, b, hidden, mixed):
    """One step's gate math. In f32 this is bitwise the _cell math with
    gates_x = x@W_ih + b hoisted; under mixed precision the x-projection
    accumulates in f32 WITHOUT an intermediate bf16 rounding (the hoisted
    path rounds gates_x to bf16 once) — one fewer rounding, so fused-vs-
    default forwards agree to bf16 ulp, not bitwise."""
    if mixed:
        gates = (jnp.matmul(x_t, w_ih, preferred_element_type=jnp.float32)
                 + b.astype(jnp.float32)
                 + jnp.matmul(h.astype(w_hh.dtype), w_hh,
                              preferred_element_type=jnp.float32))
        if _BF16_GATES:
            gates = gates.astype(jnp.bfloat16)
    else:
        gates = (x_t @ w_ih + b) + h @ w_hh
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden:])
    c_t = (f * c).astype(c.dtype) + i * g
    h_t = o * jnp.tanh(c_t.astype(gates.dtype))
    return i, f, g, o, c_t, h_t


def _chunked_scan(step, carry, xs, reverse=False, k=1):
    """`lax.scan(step, carry, xs, reverse=reverse)` with K frames per
    while-iteration: the leading axis is blocked to [T//K, K, ...], each
    iteration runs K trace-time-unrolled steps, and every output stream is
    written as ONE [K, ...] slab per iteration (one dynamic-update-slice
    instead of K). The T%K remainder runs as a per-frame scan chained after
    the blocks (forward) / before them (reverse). Unlike lax.scan's
    `unroll=K` (which keeps per-frame output writes and carry copies), this
    divides the while-iteration count — and its ~9 us/iteration overhead —
    by K."""
    leaves = jax.tree_util.tree_leaves(xs)
    t = leaves[0].shape[0]
    if k <= 1 or t < 2 * k:
        return jax.lax.scan(step, carry, xs, reverse=reverse)
    nb, r = divmod(t, k)
    t0 = nb * k
    tmap = jax.tree_util.tree_map
    if reverse:
        # the tail (first r frames) is processed AFTER the main blocks
        main_xs = tmap(lambda a: a[r:].reshape((nb, k) + a.shape[1:]), xs)
        tail_xs = tmap(lambda a: a[:r], xs)
    else:
        main_xs = tmap(lambda a: a[:t0].reshape((nb, k) + a.shape[1:]), xs)
        tail_xs = tmap(lambda a: a[t0:], xs)

    def block_step(c, x_blk):
        outs = []
        order = range(k - 1, -1, -1) if reverse else range(k)
        for i in order:
            c, o = step(c, tmap(lambda a: a[i], x_blk))
            outs.append(o)
        if reverse:
            outs = outs[::-1]
        return c, tmap(lambda *ls: jnp.stack(ls), *outs)

    carry, ys_main = jax.lax.scan(block_step, carry, main_xs,
                                  reverse=reverse)
    ys_main = tmap(lambda a: a.reshape((t0,) + a.shape[2:]), ys_main)
    if r == 0:
        return carry, ys_main
    carry, ys_tail = jax.lax.scan(step, carry, tail_xs, reverse=reverse)
    first, second = ((ys_tail, ys_main) if reverse else (ys_main, ys_tail))
    return carry, tmap(lambda u, v: jnp.concatenate([u, v], axis=0),
                       first, second)


def _h_from_ys_exact(mixed):
    """True when h_prev can be reconstructed exactly from the shifted ys
    stream (see the block comment above): the gate-dtype h must survive the
    x-dtype round trip, which holds unless the gates stayed f32 while the
    activations are bf16."""
    return not (mixed and not _BF16_GATES)


def _shift_prev(ys, h0, reverse, mdt):
    """h_prev stream from the stacked outputs: the state ENTERING step t is
    the output of the previously-processed step (t-1 forward, t+1 reverse),
    with h0 entering the first processed step."""
    h0r = h0[None].astype(ys.dtype)
    if reverse:
        shifted = jnp.concatenate([ys[1:], h0r], axis=0)
    else:
        shifted = jnp.concatenate([h0r, ys[:-1]], axis=0)
    return shifted.astype(mdt)


def _lstm_fused_primal(reverse, w_ih, w_hh, b, x, h0, c0, residuals):
    hidden = w_hh.shape[0]
    mixed = w_hh.dtype == jnp.bfloat16 or x.dtype == jnp.bfloat16
    save_h = residuals and not _h_from_ys_exact(mixed)

    def step(carry, x_t):
        h, c = carry
        *_, c_t, h_t = _fused_gate_fwd(x_t, h, c, w_ih, w_hh, b, hidden,
                                       mixed)
        h_t = h_t.astype(h.dtype)
        if save_h:
            # corner case: stream out the state ENTERING this step (h in
            # the recurrence-matmul dtype — exact via the f32 carry)
            return (h_t, c_t), (h_t.astype(x.dtype), h.astype(w_hh.dtype), c)
        if residuals:
            return (h_t, c_t), (h_t.astype(x.dtype), c)
        return (h_t, c_t), h_t.astype(x.dtype)

    (hT, cT), ys = _chunked_scan(step, (h0, c0), x, reverse=reverse,
                                 k=_FUSED_CHUNK)
    return (hT, cT), ys


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def lstm_fused(reverse, w_ih, w_hh, b, x, h0, c0):
    """(ys [T,R,H] in x.dtype, hT, cT) — scan-major x [T, R, C]."""
    (hT, cT), ys = _lstm_fused_primal(reverse, w_ih, w_hh, b, x, h0, c0,
                                      residuals=False)
    return ys, hT, cT


def _lstm_fused_fwd(reverse, w_ih, w_hh, b, x, h0, c0):
    (hT, cT), res = _lstm_fused_primal(
        reverse, w_ih, w_hh, b, x, h0, c0, residuals=True)
    if len(res) == 3:                     # corner case: explicit h_prev
        ys, h_src, c_prev = res
    else:                                 # default: ys doubles as h source
        ys, c_prev = res
        h_src = ys
    return (ys, hT, cT), (w_ih, w_hh, b, x, h0, c0, h_src, c_prev)


def _lstm_fused_bwd(reverse, res, cts):
    w_ih, w_hh, b, x, h0, c0, h_src, c_prev = res
    dy, dhT, dcT = cts
    hidden = w_hh.shape[0]
    mixed = w_hh.dtype == jnp.bfloat16 or x.dtype == jnp.bfloat16
    if _h_from_ys_exact(mixed):
        h_prev = _shift_prev(h_src, h0, reverse, w_hh.dtype)
    else:
        h_prev = h_src
    f32 = jnp.float32
    gdt = jnp.bfloat16 if (mixed and _BF16_GATES) else x.dtype
    mdt = w_hh.dtype                       # recurrence-matmul dtype
    w_hh_t = w_hh.T
    w_ih_t = w_ih.T

    def step(carry, inp):
        dh_next, dc_next, dwih, dwhh, db = carry
        x_t, hp, cp, dy_t = inp
        i, f, g, o, c_t, _ = _fused_gate_fwd(x_t, hp, cp, w_ih, w_hh, b,
                                             hidden, mixed)
        i, f, g, o = (a.astype(f32) for a in (i, f, g, o))
        # primal evaluated tanh on the gdt-cast cell state — recompute at
        # the same point so the backward differentiates the actual primal
        tc = jnp.tanh(c_t.astype(gdt)).astype(f32)
        dh = dy_t.astype(f32) + dh_next
        do = dh * tc
        dc = dc_next + dh * o * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * g * i * (1.0 - i),
            dc * cp.astype(f32) * f * (1.0 - f),
            dc * i * (1.0 - g * g),
            do * o * (1.0 - o)], axis=-1)
        dg_m = dgates.astype(mdt)
        dh_prev = jnp.matmul(dg_m, w_hh_t, preferred_element_type=f32)
        dc_prev = dc * f
        # rank-R weight-grad updates into the f32 carry accumulators
        dwhh = dwhh + jnp.einsum("rh,rk->hk", hp, dg_m,
                                 preferred_element_type=f32)
        dwih = dwih + jnp.einsum("rc,rk->ck", x_t.astype(mdt), dg_m,
                                 preferred_element_type=f32)
        db = db + jnp.sum(dgates, axis=0)
        dx_t = jnp.matmul(dg_m, w_ih_t,
                          preferred_element_type=f32).astype(x.dtype)
        return (dh_prev, dc_prev, dwih, dwhh, db), dx_t

    init = (dhT.astype(f32), dcT.astype(f32),
            jnp.zeros(w_ih.shape, f32), jnp.zeros(w_hh.shape, f32),
            jnp.zeros(b.shape, f32))
    (dh0, dc0, dwih, dwhh, db), dx = _chunked_scan(
        step, init, (x, h_prev, c_prev, dy), reverse=not reverse,
        k=_FUSED_CHUNK_BWD or _FUSED_CHUNK)
    return (dwih.astype(w_ih.dtype), dwhh.astype(w_hh.dtype),
            db.astype(b.dtype), dx,
            dh0.astype(h0.dtype), dc0.astype(c0.dtype))


lstm_fused.defvjp(_lstm_fused_fwd, _lstm_fused_bwd)


# ---------------------- direction-fused BLSTM core ----------------------
#
# Both directions of a bidirectional layer in ONE chunked scan: the weights
# carry a leading direction axis ([2, C, 4H] / [2, H, 4H] / [2, 4H]) and the
# input arrives pre-mirrored (xx[:, 1] is the time-reversed sequence), so
# each step's projections are single batched matmuls over [2, R, ...] and
# the layer costs HALF the while-iterations of the two-scan fused path.
# The mirror flips live OUTSIDE the custom VJP (plain jnp ops XLA autodiffs);
# inside, both directions scan forward. Gate math identical to lstm_fused
# (_fused_gate_fwd batches over the direction axis unchanged).


def _blstm_dir_primal(w_ih, w_hh, b, xx, residuals):
    hidden = w_hh.shape[-2]
    mixed = w_hh.dtype == jnp.bfloat16 or xx.dtype == jnp.bfloat16
    b2 = b[:, None, :]
    cdt = jnp.float32 if mixed else xx.dtype
    z0 = jnp.zeros(xx.shape[1:-1] + (hidden,), cdt)     # [2, R, H]

    save_h = residuals and not _h_from_ys_exact(mixed)

    def step(carry, x_t):
        h, c = carry
        *_, c_t, h_t = _fused_gate_fwd(x_t, h, c, w_ih, w_hh, b2, hidden,
                                       mixed)
        h_t = h_t.astype(h.dtype)
        if save_h:
            return (h_t, c_t), (h_t.astype(xx.dtype), h.astype(w_hh.dtype), c)
        if residuals:
            return (h_t, c_t), (h_t.astype(xx.dtype), c)
        return (h_t, c_t), h_t.astype(xx.dtype)

    _, ys = _chunked_scan(step, (z0, z0), xx, k=_FUSED_CHUNK)
    return ys


@jax.custom_vjp
def blstm_fused_dir(w_ih, w_hh, b, xx):
    """ys [T, 2, R, H] in xx.dtype — xx [T, 2, R, C] pre-mirrored,
    weights direction-stacked [2, ...]. Initial state is zeros (BLSTM)."""
    return _blstm_dir_primal(w_ih, w_hh, b, xx, residuals=False)


def _blstm_dir_fwd(w_ih, w_hh, b, xx):
    res = _blstm_dir_primal(w_ih, w_hh, b, xx, residuals=True)
    if len(res) == 3:                     # corner case: explicit h_prev
        ys, h_src, c_prev = res
    else:                                 # default: ys doubles as h source
        ys, c_prev = res
        h_src = ys
    return ys, (w_ih, w_hh, b, xx, h_src, c_prev)


def _blstm_dir_bwd(res, dy):
    w_ih, w_hh, b, xx, h_src, c_prev = res
    hidden = w_hh.shape[-2]
    mixed = w_hh.dtype == jnp.bfloat16 or xx.dtype == jnp.bfloat16
    if _h_from_ys_exact(mixed):
        # both directions scan forward over pre-mirrored input, zero init
        z0 = jnp.zeros(xx.shape[1:-1] + (hidden,), h_src.dtype)
        h_prev = _shift_prev(h_src, z0, False, w_hh.dtype)
    else:
        h_prev = h_src
    f32 = jnp.float32
    gdt = jnp.bfloat16 if (mixed and _BF16_GATES) else xx.dtype
    mdt = w_hh.dtype
    b2 = b[:, None, :]
    w_hh_t = jnp.swapaxes(w_hh, -1, -2)
    w_ih_t = jnp.swapaxes(w_ih, -1, -2)

    def step(carry, inp):
        dh_next, dc_next, dwih, dwhh, db = carry
        x_t, hp, cp, dy_t = inp
        i, f, g, o, c_t, _ = _fused_gate_fwd(x_t, hp, cp, w_ih, w_hh, b2,
                                             hidden, mixed)
        i, f, g, o = (a.astype(f32) for a in (i, f, g, o))
        tc = jnp.tanh(c_t.astype(gdt)).astype(f32)
        dh = dy_t.astype(f32) + dh_next
        do = dh * tc
        dc = dc_next + dh * o * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * g * i * (1.0 - i),
            dc * cp.astype(f32) * f * (1.0 - f),
            dc * i * (1.0 - g * g),
            do * o * (1.0 - o)], axis=-1)
        dg_m = dgates.astype(mdt)
        dh_prev = jnp.matmul(dg_m, w_hh_t, preferred_element_type=f32)
        dc_prev = dc * f
        dwhh = dwhh + jnp.einsum("drh,drk->dhk", hp, dg_m,
                                 preferred_element_type=f32)
        dwih = dwih + jnp.einsum("drc,drk->dck", x_t.astype(mdt), dg_m,
                                 preferred_element_type=f32)
        db = db + jnp.sum(dgates, axis=-2)              # [2, 4H]
        dx_t = jnp.matmul(dg_m, w_ih_t,
                          preferred_element_type=f32).astype(xx.dtype)
        return (dh_prev, dc_prev, dwih, dwhh, db), dx_t

    init = (jnp.zeros(xx.shape[1:-1] + (hidden,), f32),
            jnp.zeros(xx.shape[1:-1] + (hidden,), f32),
            jnp.zeros(w_ih.shape, f32), jnp.zeros(w_hh.shape, f32),
            jnp.zeros(b.shape, f32))
    (_, _, dwih, dwhh, db), dx = _chunked_scan(
        step, init, (xx, h_prev, c_prev, dy), reverse=True,
        k=_FUSED_CHUNK_BWD or _FUSED_CHUNK)
    return (dwih.astype(w_ih.dtype), dwhh.astype(w_hh.dtype),
            db.astype(b.dtype), dx)


blstm_fused_dir.defvjp(_blstm_dir_fwd, _blstm_dir_bwd)


def _run_fused(params, x, h0, c0, reverse):
    """Apply lstm_fused to trailing-time x [..., T, C], flattening the lead
    dims to one row axis. Returns (y [..., T, H], hT, cT [..., H])."""
    t = x.shape[-2]
    lead = x.shape[:-2]
    r = math.prod(lead)
    x_t = jnp.moveaxis(x, -2, 0).reshape(t, r, x.shape[-1])
    mixed = (params["w_hh"].dtype == jnp.bfloat16
             or x.dtype == jnp.bfloat16)
    if _slab_route(mixed) and t >= 2 and _h_from_ys_exact(mixed):
        from sound_bubble_tpu.ops.pallas.lstm_train_slab import lstm_slab
        ys, hT, cT = lstm_slab(reverse, params["w_ih"], params["w_hh"],
                               params["b"], x_t,
                               h0.reshape(r, -1), c0.reshape(r, -1))
    else:
        ys, hT, cT = lstm_fused(reverse, params["w_ih"], params["w_hh"],
                                params["b"], x_t,
                                h0.reshape(r, -1), c0.reshape(r, -1))
    y = jnp.moveaxis(ys.reshape((t,) + lead + (-1,)), 0, -2)
    return y, hT.reshape(lead + (-1,)), cT.reshape(lead + (-1,))


def init_blstm_params(key, in_dim: int, hidden: int, dtype=jnp.float32):
    kf, kb = jax.random.split(key)
    return {
        "fwd": init_lstm_params(kf, in_dim, hidden, dtype),
        "bwd": init_lstm_params(kb, in_dim, hidden, dtype),
    }


def blstm(params, x, unroll: int | None = None):
    """Bidirectional LSTM over axis -2; concat outputs -> [..., T, 2H].

    TPU-first trick: both directions run in ONE scan of length T — the
    backward half processes the time-reversed sequence, with the two weight
    sets stacked on a leading "direction" axis so each step is a single
    batched matmul. Halves the sequential-step count vs two scans.
    """
    if _PALLAS_BLSTM and x.ndim == 3:
        # the fused kernel keeps gates_x and y resident in VMEM; fall back to
        # the scan when they would not fit (large offline/serving batches)
        h = params["fwd"]["w_hh"].shape[0]
        vmem_bytes = x.shape[0] * x.shape[1] * (8 * h + 2 * h) * 4
        if vmem_bytes < 8 * 2 ** 20:
            from sound_bubble_tpu.ops.pallas.lstm_kernel import blstm_pallas
            return blstm_pallas(params, x)
    fwd, bwd = params["fwd"], params["bwd"]
    hidden = fwd["w_hh"].shape[0]
    t = x.shape[-2]
    if _FUSED_SCAN and t > 1:
        if _DIR_FUSE:
            # both directions in ONE chunked scan (half the while-
            # iterations; batched [2,...] matmuls per step). The mirror
            # flips are outside the custom VJP — XLA autodiffs them.
            lead = x.shape[:-2]
            r = math.prod(lead)
            x_t = jnp.moveaxis(x, -2, 0).reshape(t, r, x.shape[-1])
            xx = jnp.stack([x_t, jnp.flip(x_t, 0)], axis=1)   # [T,2,R,C]
            ys = blstm_fused_dir(
                jnp.stack([fwd["w_ih"], bwd["w_ih"]]),
                jnp.stack([fwd["w_hh"], bwd["w_hh"]]),
                jnp.stack([fwd["b"], bwd["b"]]), xx)          # [T,2,R,H]
            y = jnp.concatenate([ys[:, 0], jnp.flip(ys[:, 1], 0)], axis=-1)
            return jnp.moveaxis(y.reshape((t,) + lead + (-1,)), 0, -2)
        # two fused scans sharing x (the reversed direction is a
        # scan(reverse=True) — no jnp.flip copies in or out)
        cdt = (jnp.float32 if (fwd["w_hh"].dtype == jnp.bfloat16
                               or x.dtype == jnp.bfloat16) else x.dtype)
        lead = x.shape[:-2]
        z0 = jnp.zeros(lead + (hidden,), cdt)
        yf, _, _ = _run_fused(fwd, x, z0, z0, reverse=False)
        yb, _, _ = _run_fused(bwd, x, z0, z0, reverse=True)
        return jnp.concatenate([yf, yb], axis=-1)
    if _CUSTOM_VJP:
        x_t = jnp.moveaxis(x, -2, 0)
        if _PALLAS_TRAIN and _BF16_GATES:
            # fused-direction Pallas kernel: one recurrence matmul at
            # K = 2H (full MXU width), half the sequential steps, and the
            # time-mirrored direction handled by index maps (no flips)
            from sound_bubble_tpu.ops.pallas.lstm_train_kernel import (
                blstm_pallas_train)
            lead = x_t.shape[1:-1]
            r = math.prod(lead)
            y = blstm_pallas_train(fwd, bwd,
                                   x_t.reshape(x_t.shape[0], r, -1))
            return jnp.moveaxis(
                y.reshape((x_t.shape[0],) + lead + (-1,)), 0, -2)
        # two custom-VJP passes (fwd + time-reversed) instead of the fused
        # 2-direction scan: same total work; the backward-scan savings of
        # lstm_cvjp apply to both directions
        cdt = (jnp.float32 if (fwd["w_hh"].dtype == jnp.bfloat16
                               or x.dtype == jnp.bfloat16) else x.dtype)
        lead = x.shape[:-2]
        z0 = jnp.zeros(lead + (hidden,), cdt)
        yf, _, _ = _run_cvjp(fwd["w_ih"], fwd["w_hh"], fwd["b"], x_t, z0, z0)
        yb, _, _ = _run_cvjp(bwd["w_ih"], bwd["w_hh"], bwd["b"],
                             jnp.flip(x_t, 0), z0, z0)
        return jnp.concatenate(
            [jnp.moveaxis(yf, 0, -2),
             jnp.flip(jnp.moveaxis(yb, 0, -2), -2)], axis=-1)
    w_ih = jnp.stack([fwd["w_ih"], bwd["w_ih"]])      # [2, C, 4H]
    w_hh = jnp.stack([fwd["w_hh"], bwd["w_hh"]])      # [2, H, 4H]
    b = jnp.stack([fwd["b"], bwd["b"]])               # [2, 4H]
    xx = jnp.stack([x, jnp.flip(x, axis=-2)])         # [2, ..., T, C]
    gates_x = jnp.einsum("d...tc,dch->d...th", xx, w_ih) + \
        b.reshape((2,) + (1,) * (x.ndim - 1) + (4 * hidden,))
    lead = xx.shape[:-2]
    mixed = w_hh.dtype == jnp.bfloat16 or x.dtype == jnp.bfloat16
    carry_dtype = jnp.float32 if mixed else x.dtype
    h0 = jnp.zeros(lead + (hidden,), carry_dtype)

    def step(carry, gx):
        h, c = carry
        if mixed:
            gates = gx.astype(jnp.float32) + jnp.einsum(
                "d...h,dhk->d...k", h.astype(w_hh.dtype), w_hh,
                preferred_element_type=jnp.float32)
            if _BF16_GATES:
                gates = gates.astype(jnp.bfloat16)
        else:
            gates = gx + jnp.einsum("d...h,dhk->d...k", h, w_hh)
        i = jax.nn.sigmoid(gates[..., :hidden])
        f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
        g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[..., 3 * hidden:])
        c = (f * c).astype(c.dtype) + i * g
        h = o * jnp.tanh(c.astype(gates.dtype))
        h = h.astype(carry_dtype)
        return (h, c), h.astype(x.dtype)

    unroll = _UNROLL if unroll is None else unroll
    gx_t = jnp.moveaxis(gates_x, -2, 0)               # [T, 2, ..., 4H]
    _, ys = jax.lax.scan(step, (h0, h0), gx_t, unroll=min(unroll, t))
    ys = jnp.moveaxis(ys, 0, -2)                      # [2, ..., T, H]
    return jnp.concatenate([ys[0], jnp.flip(ys[1], axis=-2)], axis=-1)
