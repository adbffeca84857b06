"""Pallas TPU kernels: training-time LSTM sequence recurrence (fwd + bwd).

The production train step is WORK-bound on its 12 LSTM recurrences (6 blocks
x intra BLSTM + inter LSTM, reference
/root/reference/src/models/tfgridnet_realtime_clean_dis_embd3/tfgridnet_causal.py:800-849):
round-3 decomposition on a v5e was fwd 50 ms / grad 303 ms at batch 8, with
the backward dominated by XLA's per-scan-step loop overhead and HBM
round-trips of h/c/gates. These kernels run each whole recurrence in ONE
kernel launch:

- **forward** — grid (row_tiles, T), time innermost so the (h, c) carry
  lives in fp32 VMEM scratch across the whole sequence; the input
  projection x @ W_ih + b is fused into the step (so gates_x never
  materializes in HBM); saves the post-nonlinearity gates (i,f,g,o) and the
  fp32 cell sequence as residuals so the backward never redoes the
  recurrence matmul.
- **backward** — same grid reversed in time; streams the saved
  gates/c/c_prev/dy blocks through the sequential grid's double-buffered
  pipeline, carries (dh, dc) in scratch, emits dgates per step. The
  dW_hh / dW_ih / dx / db reductions happen OUTSIDE as single large MXU
  matmuls over dgates_seq — never as rank-updates inside the scan (XLA's
  scan autodiff does the latter; it is the single largest cost in the
  autodiff backward).

Precision replicates `ops/rnn.py`: either pure fp32 (primal exact vs the
lax.scan path), or the mixed path (bf16 weights/activations/gates, fp32
(h, c) carries, fp32 matmul accumulation) used by the bf16 campaign
trainer. Mixed agrees with the scan path to bf16-ulp level, not bitwise:
XLA fuses each program's cell body and may elide intermediate bf16
roundings differently per program — the scan path under jit is equally
unstable against itself across remat/fusion contexts, so ulp-level is the
strongest equivalence that exists. Flipping the knob mid-training is safe
(same scale of perturbation as re-jitting the step).

Gradients are grad-checked against autodiff in tests/test_pallas_train.py
(interpret mode on CPU; the same kernels lower to Mosaic on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _row_tile(r: int) -> int:
    """Row-tile size: one tile when small, else 640 (multiple of the bf16
    sublane 16; keeps fwd+bwd VMEM footprints ~3-6 MB)."""
    if r <= 768:
        return _round_up(r, 16)
    return 640


# --------------------------- forward kernel ---------------------------


def _fwd_kernel(x_ref, wih_ref, whh_ref, b_ref, h0_ref, c0_ref,
                y_ref, gates_ref, c_ref, h_s, c_s, *, hidden, mixed):
    """One (row_tile, t) grid step: advance every row one timestep."""
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:].astype(f32)
        c_s[:] = c0_ref[:].astype(f32)

    x_t = x_ref[0]                                   # [RT, C]
    if mixed:
        # gates_x rounds through bf16 exactly as the lax.scan path does
        # (ops/rnn.py computes `x @ w_ih + b` on bf16 operands outside the
        # scan) so the primal stays bit-identical across the knob
        gx = jnp.dot(x_t, wih_ref[:],
                     preferred_element_type=f32).astype(jnp.bfloat16) \
            + b_ref[:]
        gates = (gx.astype(f32)
                 + jnp.dot(h_s[:].astype(jnp.bfloat16), whh_ref[:],
                           preferred_element_type=f32)
                 ).astype(jnp.bfloat16)
    else:
        gx = jnp.dot(x_t, wih_ref[:], preferred_element_type=f32) + b_ref[:]
        gates = gx + jnp.dot(h_s[:], whh_ref[:], preferred_element_type=f32)
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    # mixed: f(bf16) * c(f32) promotes to f32; i*g stays bf16 — identical
    # op order/dtypes to ops.rnn._cell
    c_t = (f * c_s[:]).astype(f32) + i * g
    h_t = o * jnp.tanh(c_t.astype(gates.dtype))

    y_ref[0] = h_t.astype(y_ref.dtype)
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)
    c_ref[0] = c_t
    h_s[:] = h_t.astype(f32)
    c_s[:] = c_t


def lstm_seq_fwd(w_ih, w_hh, b, x, h0, c0, *, interpret=None):
    """Fused LSTM forward over scan-major x [T, R, C].

    Returns (y [T, R, C->H] in x.dtype, gates_seq [T, R, 4H] gate dtype,
    c_seq [T, R, H] fp32). h0/c0: [R, H] (any float dtype).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_len, r, c = x.shape
    hidden = w_hh.shape[0]
    mixed = w_hh.dtype == jnp.bfloat16 or x.dtype == jnp.bfloat16
    gdt = jnp.bfloat16 if mixed else x.dtype
    f32 = jnp.float32

    rt = _row_tile(r)
    rp = _round_up(r, rt)
    if rp != r:
        x = jnp.pad(x, ((0, 0), (0, rp - r), (0, 0)))
        h0 = jnp.pad(h0, ((0, rp - r), (0, 0)))
        c0 = jnp.pad(c0, ((0, rp - r), (0, 0)))
    b2 = b.reshape(1, 4 * hidden)

    grid = (rp // rt, t_len)
    y, gates_seq, c_seq = pl.pallas_call(
        functools.partial(_fwd_kernel, hidden=hidden, mixed=mixed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rt, c), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),           # x
            pl.BlockSpec((c, 4 * hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),           # w_ih
            pl.BlockSpec((hidden, 4 * hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),           # w_hh
            pl.BlockSpec((1, 4 * hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),           # b
            pl.BlockSpec((rt, hidden), lambda rr, t: (rr, 0),
                         memory_space=pltpu.VMEM),           # h0
            pl.BlockSpec((rt, hidden), lambda rr, t: (rr, 0),
                         memory_space=pltpu.VMEM),           # c0
        ],
        out_specs=(
            pl.BlockSpec((1, rt, hidden), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),           # y
            pl.BlockSpec((1, rt, 4 * hidden), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),           # gates
            pl.BlockSpec((1, rt, hidden), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),           # c_seq
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_len, rp, hidden), x.dtype),
            jax.ShapeDtypeStruct((t_len, rp, 4 * hidden), gdt),
            jax.ShapeDtypeStruct((t_len, rp, hidden), f32),
        ),
        scratch_shapes=[pltpu.VMEM((rt, hidden), f32),
                        pltpu.VMEM((rt, hidden), f32)],
        interpret=interpret,
    )(x, w_ih, w_hh, b2, h0, c0)
    if rp != r:
        y, gates_seq, c_seq = y[:, :r], gates_seq[:, :r], c_seq[:, :r]
    return y, gates_seq, c_seq


# --------------------------- backward kernel ---------------------------


def _bwd_kernel(gates_ref, c_ref, cprev_ref, dy_ref, whht_ref,
                dhT_ref, dcT_ref, dg_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, *, hidden, mixed):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    f32 = jnp.float32
    gdt = jnp.bfloat16 if mixed else f32

    @pl.when(t == 0)
    def _():
        dh_s[:] = dhT_ref[:].astype(f32)
        dc_s[:] = dcT_ref[:].astype(f32)

    gts = gates_ref[0]
    i = gts[:, :hidden].astype(f32)
    f = gts[:, hidden:2 * hidden].astype(f32)
    g = gts[:, 2 * hidden:3 * hidden].astype(f32)
    o = gts[:, 3 * hidden:].astype(f32)
    # the primal evaluated tanh on the gate-dtype-cast cell state; backward
    # must differentiate the actual primal (ops/rnn.py:_lstm_cvjp_bwd)
    tc = jnp.tanh(c_ref[0].astype(gdt)).astype(f32)
    dh = dy_ref[0].astype(f32) + dh_s[:]
    do = dh * tc
    dc = dc_s[:] + dh * o * (1.0 - tc * tc)
    cp = cprev_ref[0].astype(f32)
    dgates = jnp.concatenate([
        dc * g * i * (1.0 - i),
        dc * cp * f * (1.0 - f),
        dc * i * (1.0 - g * g),
        do * o * (1.0 - o)], axis=-1)
    if mixed:
        dh_prev = jnp.dot(dgates.astype(jnp.bfloat16), whht_ref[:],
                          preferred_element_type=f32)
    else:
        dh_prev = jnp.dot(dgates, whht_ref[:], preferred_element_type=f32)
    dc_prev = dc * f

    dg_ref[0] = dgates.astype(dg_ref.dtype)
    dh_s[:] = dh_prev
    dc_s[:] = dc_prev
    # constant index map -> block persists in VMEM; the last grid step's
    # value (t = T-1, i.e. timestep 0) is what lands in HBM
    dh0_ref[:] = dh_prev
    dc0_ref[:] = dc_prev


def lstm_seq_bwd(gates_seq, c_seq, c0, dy, dhT, dcT, w_hh, out_dtype,
                 *, interpret=None):
    """Backward scan: returns (dgates_seq [T, R, 4H] out_dtype,
    dh0 [R, H] fp32, dc0 [R, H] fp32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_len, r, _ = c_seq.shape
    hidden = w_hh.shape[0]
    mixed = w_hh.dtype == jnp.bfloat16 or out_dtype == jnp.bfloat16
    f32 = jnp.float32

    cprev_seq = jnp.concatenate(
        [c0[None].astype(f32), c_seq[:-1]], axis=0)
    w_hh_t = w_hh.T

    rt = _row_tile(r)
    rp = _round_up(r, rt)
    if rp != r:
        pad3 = ((0, 0), (0, rp - r), (0, 0))
        gates_seq = jnp.pad(gates_seq, pad3)
        c_seq = jnp.pad(c_seq, pad3)
        cprev_seq = jnp.pad(cprev_seq, pad3)
        dy = jnp.pad(dy, pad3)
        dhT = jnp.pad(dhT, ((0, rp - r), (0, 0)))
        dcT = jnp.pad(dcT, ((0, rp - r), (0, 0)))

    nt = t_len
    grid = (rp // rt, t_len)
    dgates_seq, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, hidden=hidden, mixed=mixed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rt, 4 * hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),           # gates
            pl.BlockSpec((1, rt, hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),           # c_t
            pl.BlockSpec((1, rt, hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),           # c_prev
            pl.BlockSpec((1, rt, hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),           # dy
            pl.BlockSpec((4 * hidden, hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),           # w_hh^T
            pl.BlockSpec((rt, hidden), lambda rr, t: (rr, 0),
                         memory_space=pltpu.VMEM),           # dhT
            pl.BlockSpec((rt, hidden), lambda rr, t: (rr, 0),
                         memory_space=pltpu.VMEM),           # dcT
        ],
        out_specs=(
            pl.BlockSpec((1, rt, 4 * hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),           # dgates
            pl.BlockSpec((rt, hidden), lambda rr, t: (rr, 0),
                         memory_space=pltpu.VMEM),           # dh0
            pl.BlockSpec((rt, hidden), lambda rr, t: (rr, 0),
                         memory_space=pltpu.VMEM),           # dc0
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_len, rp, 4 * hidden), out_dtype),
            jax.ShapeDtypeStruct((rp, hidden), f32),
            jax.ShapeDtypeStruct((rp, hidden), f32),
        ),
        scratch_shapes=[pltpu.VMEM((rt, hidden), f32),
                        pltpu.VMEM((rt, hidden), f32)],
        interpret=interpret,
    )(gates_seq, c_seq, cprev_seq, dy, w_hh_t, dhT, dcT)
    if rp != r:
        dgates_seq, dh0, dc0 = dgates_seq[:, :r], dh0[:r], dc0[:r]
    return dgates_seq, dh0, dc0


# ------------------------- custom-VJP wrapper -------------------------


@jax.custom_vjp
def lstm_pallas_train(w_ih, w_hh, b, x, h0, c0):
    """Drop-in for ops.rnn.lstm_cvjp with the scans in Pallas.

    x scan-major [T, R, C]; returns (y [T, R, H], hT [R, H], cT [R, H]).
    Primal numerics match the lax.scan path (same casts/op order)."""
    y, _, c_seq = lstm_seq_fwd(w_ih, w_hh, b, x, h0, c0)
    return y, y[-1].astype(h0.dtype), c_seq[-1].astype(c0.dtype)


def _lpt_fwd(w_ih, w_hh, b, x, h0, c0):
    y, gates_seq, c_seq = lstm_seq_fwd(w_ih, w_hh, b, x, h0, c0)
    out = (y, y[-1].astype(h0.dtype), c_seq[-1].astype(c0.dtype))
    return out, (w_ih, w_hh, x, h0, c0, y, gates_seq, c_seq)


def _lpt_bwd(res, cts):
    w_ih, w_hh, x, h0, c0, y, gates_seq, c_seq = res
    dy, dhT, dcT = cts
    hidden = w_hh.shape[0]
    f32 = jnp.float32

    dgates_seq, dh0, dc0 = lstm_seq_bwd(
        gates_seq, c_seq, c0, dy, dhT, dcT, w_hh, x.dtype)

    # weight/input grads: single large MXU matmuls (the point of the
    # custom VJP — XLA scan-AD runs these as per-step rank updates)
    h_prev = jnp.concatenate(
        [h0[None].astype(y.dtype), y[:-1]], axis=0)
    dgf = dgates_seq.reshape(-1, 4 * hidden)
    dw_hh = jnp.matmul(
        h_prev.reshape(-1, hidden).T.astype(dgates_seq.dtype), dgf,
        preferred_element_type=f32).astype(w_hh.dtype)
    dw_ih = jnp.matmul(
        x.reshape(-1, x.shape[-1]).T, dgf,
        preferred_element_type=f32).astype(w_ih.dtype)
    db = jnp.sum(dgf.astype(f32), axis=0).astype(w_ih.dtype)
    dx = jnp.matmul(dgates_seq, w_ih.T,
                    preferred_element_type=f32).astype(x.dtype)
    return (dw_ih, dw_hh, db, dx, dh0.astype(h0.dtype),
            dc0.astype(c0.dtype))


lstm_pallas_train.defvjp(_lpt_fwd, _lpt_bwd)


# ------------------- fused-direction BLSTM kernels -------------------
#
# Both directions of the intra-frequency BLSTM advance in ONE kernel step:
# the state is [h_fwd | h_bwd] (R, 2H) and the recurrent matrix is the
# direction-block-diagonal [[W_f, 0], [0, W_b]] (2H, 8H) — the fused matmul
# contracts over K = 2H = 128 (the MXU's full systolic width; a single
# direction's K = 64 runs the array half idle), and the sequential step
# count halves vs running the directions as two kernels. The backward
# direction reads its input at the mirrored time index via the BlockSpec
# index map, so no flipped copy of x/y/dy ever materializes.
# (Same packing idea as the inference kernels in lstm_kernel.py /
# stack_kernel.py, extended with saved residuals + a backward kernel.)


def _blstm_fwd_kernel(xf_ref, xb_ref, wihf_ref, wihb_ref, whh_ref, b_ref,
                      yf_ref, yb_ref, gates_ref, c_ref, h_s, c_s,
                      *, hidden, mixed):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    f32 = jnp.float32
    h = hidden

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    if mixed:
        gx_f = jnp.dot(xf_ref[0], wihf_ref[:],
                       preferred_element_type=f32).astype(jnp.bfloat16)
        gx_b = jnp.dot(xb_ref[0], wihb_ref[:],
                       preferred_element_type=f32).astype(jnp.bfloat16)
        gx = jnp.concatenate([gx_f, gx_b], axis=-1) + b_ref[:]
        gates = (gx.astype(f32)
                 + jnp.dot(h_s[:].astype(jnp.bfloat16), whh_ref[:],
                           preferred_element_type=f32)
                 ).astype(jnp.bfloat16)
    else:
        gx_f = jnp.dot(xf_ref[0], wihf_ref[:], preferred_element_type=f32)
        gx_b = jnp.dot(xb_ref[0], wihb_ref[:], preferred_element_type=f32)
        gx = jnp.concatenate([gx_f, gx_b], axis=-1) + b_ref[:]
        gates = gx + jnp.dot(h_s[:], whh_ref[:], preferred_element_type=f32)

    # direction-major layout: lanes [0, 4H) fwd gates, [4H, 8H) bwd gates
    i = jax.nn.sigmoid(jnp.concatenate(
        [gates[:, :h], gates[:, 4 * h:5 * h]], axis=-1))
    f = jax.nn.sigmoid(jnp.concatenate(
        [gates[:, h:2 * h], gates[:, 5 * h:6 * h]], axis=-1))
    g = jnp.tanh(jnp.concatenate(
        [gates[:, 2 * h:3 * h], gates[:, 6 * h:7 * h]], axis=-1))
    o = jax.nn.sigmoid(jnp.concatenate(
        [gates[:, 3 * h:4 * h], gates[:, 7 * h:]], axis=-1))
    c_t = (f * c_s[:]).astype(f32) + i * g
    h_t = o * jnp.tanh(c_t.astype(gates.dtype))

    yf_ref[0] = h_t[:, :h].astype(yf_ref.dtype)
    yb_ref[0] = h_t[:, h:].astype(yb_ref.dtype)
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)
    c_ref[0] = c_t
    h_s[:] = h_t.astype(f32)
    c_s[:] = c_t


def _blstm_bwd_kernel(gates_ref, c_ref, cprev_ref, dyf_ref, dyb_ref,
                      whht_ref, dg_ref, dh_s, dc_s, *, hidden, mixed):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    f32 = jnp.float32
    gdt = jnp.bfloat16 if mixed else f32
    h = hidden

    @pl.when(t == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    gts = gates_ref[0]
    i = gts[:, :2 * h].astype(f32)
    f = gts[:, 2 * h:4 * h].astype(f32)
    g = gts[:, 4 * h:6 * h].astype(f32)
    o = gts[:, 6 * h:].astype(f32)
    tc = jnp.tanh(c_ref[0].astype(gdt)).astype(f32)
    dy = jnp.concatenate([dyf_ref[0], dyb_ref[0]], axis=-1).astype(f32)
    dh = dy + dh_s[:]
    do = dh * tc
    dc = dc_s[:] + dh * o * (1.0 - tc * tc)
    cp = cprev_ref[0].astype(f32)
    di = dc * g * i * (1.0 - i)
    df = dc * cp * f * (1.0 - f)
    dg = dc * i * (1.0 - g * g)
    do_ = do * o * (1.0 - o)
    # back to direction-major gate lanes for the fused dh matmul
    dgates = jnp.concatenate(
        [di[:, :h], df[:, :h], dg[:, :h], do_[:, :h],
         di[:, h:], df[:, h:], dg[:, h:], do_[:, h:]], axis=-1)
    if mixed:
        dh_prev = jnp.dot(dgates.astype(jnp.bfloat16), whht_ref[:],
                          preferred_element_type=f32)
    else:
        dh_prev = jnp.dot(dgates, whht_ref[:], preferred_element_type=f32)
    dg_ref[0] = dgates.astype(dg_ref.dtype)
    dh_s[:] = dh_prev
    dc_s[:] = dc * f


def _blstm_row_tile(r: int) -> int:
    if r <= 768:
        return _round_up(r, 16)
    return 640


def _blstm_pack(fwd, bwd):
    """-> (w_ih_f [C,4H], w_ih_b [C,4H], w_hh_big [2H,8H] block-diagonal
    direction-major, b_big [1,8H])."""
    h = fwd["w_hh"].shape[0]
    w_hh = jnp.zeros((2 * h, 8 * h), fwd["w_hh"].dtype)
    w_hh = w_hh.at[:h, :4 * h].set(fwd["w_hh"])
    w_hh = w_hh.at[h:, 4 * h:].set(bwd["w_hh"])
    b = jnp.concatenate([fwd["b"], bwd["b"]]).reshape(1, 8 * h)
    return fwd["w_ih"], bwd["w_ih"], w_hh, b


@jax.custom_vjp
def blstm_pallas_train(fwd_p, bwd_p, x):
    """Fused bidirectional LSTM over scan-major x [T, R, C] -> [T, R, 2H]
    (concat [y_fwd | y_bwd], both in original time order; zero initial
    states, as the model's intra BLSTM always uses)."""
    y_f, y_b, _, _ = _blstm_fwd(fwd_p, bwd_p, x)
    return jnp.concatenate([y_f, y_b], axis=-1)


def _blstm_fwd(fwd_p, bwd_p, x, *, interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_len, r, c = x.shape
    hidden = fwd_p["w_hh"].shape[0]
    mixed = (fwd_p["w_hh"].dtype == jnp.bfloat16
             or x.dtype == jnp.bfloat16)
    gdt = jnp.bfloat16 if mixed else x.dtype
    f32 = jnp.float32
    wih_f, wih_b, whh_big, b_big = _blstm_pack(fwd_p, bwd_p)

    rt = _blstm_row_tile(r)
    rp = _round_up(r, rt)
    if rp != r:
        x = jnp.pad(x, ((0, 0), (0, rp - r), (0, 0)))

    nt = t_len
    grid = (rp // rt, t_len)
    y_f, y_b, gates_seq, c_seq = pl.pallas_call(
        functools.partial(_blstm_fwd_kernel, hidden=hidden, mixed=mixed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rt, c), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),             # x (fwd dir)
            pl.BlockSpec((1, rt, c), lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),             # x (bwd dir)
            pl.BlockSpec((c, 4 * hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 4 * hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hidden, 8 * hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rt, hidden), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),             # y_fwd
            pl.BlockSpec((1, rt, hidden), lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),             # y_bwd
            pl.BlockSpec((1, rt, 8 * hidden), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),             # gates (i|f|g|o)
            pl.BlockSpec((1, rt, 2 * hidden), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),             # c_seq
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_len, rp, hidden), x.dtype),
            jax.ShapeDtypeStruct((t_len, rp, hidden), x.dtype),
            jax.ShapeDtypeStruct((t_len, rp, 8 * hidden), gdt),
            jax.ShapeDtypeStruct((t_len, rp, 2 * hidden), f32),
        ),
        scratch_shapes=[pltpu.VMEM((rt, 2 * hidden), f32),
                        pltpu.VMEM((rt, 2 * hidden), f32)],
        interpret=interpret,
    )(x, x, wih_f, wih_b, whh_big, b_big)
    if rp != r:
        y_f, y_b = y_f[:, :r], y_b[:, :r]
        gates_seq, c_seq = gates_seq[:, :r], c_seq[:, :r]
    return y_f, y_b, gates_seq, c_seq


def _bpt_fwd(fwd_p, bwd_p, x):
    y_f, y_b, gates_seq, c_seq = _blstm_fwd(fwd_p, bwd_p, x)
    return (jnp.concatenate([y_f, y_b], axis=-1),
            (fwd_p, bwd_p, x, y_f, y_b, gates_seq, c_seq))


def _bpt_bwd(res, dy, *, interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fwd_p, bwd_p, x, y_f, y_b, gates_seq, c_seq = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_len, r, c = x.shape
    hidden = fwd_p["w_hh"].shape[0]
    mixed = (fwd_p["w_hh"].dtype == jnp.bfloat16
             or x.dtype == jnp.bfloat16)
    f32 = jnp.float32
    _, _, whh_big, _ = _blstm_pack(fwd_p, bwd_p)
    whh_big_t = whh_big.T

    cprev_seq = jnp.concatenate(
        [jnp.zeros_like(c_seq[:1]), c_seq[:-1]], axis=0)
    dy_f = dy[..., :hidden]
    dy_b = dy[..., hidden:]

    rt = _blstm_row_tile(r)
    rp = _round_up(r, rt)
    if rp != r:
        pad3 = ((0, 0), (0, rp - r), (0, 0))
        gates_seq = jnp.pad(gates_seq, pad3)
        c_seq_p = jnp.pad(c_seq, pad3)
        cprev_seq = jnp.pad(cprev_seq, pad3)
        dy_f = jnp.pad(dy_f, pad3)
        dy_b = jnp.pad(dy_b, pad3)
    else:
        c_seq_p = c_seq

    nt = t_len
    grid = (rp // rt, t_len)
    # kernel time runs reversed: grid step t processes kernel step nt-1-t;
    # the fwd direction's dy lives at original time nt-1-t, the bwd
    # direction's at original time t (mirrored) — index maps, no flips
    dgates_seq = pl.pallas_call(
        functools.partial(_blstm_bwd_kernel, hidden=hidden, mixed=mixed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rt, 8 * hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),             # gates
            pl.BlockSpec((1, rt, 2 * hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),             # c_t
            pl.BlockSpec((1, rt, 2 * hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),             # c_prev
            pl.BlockSpec((1, rt, hidden),
                         lambda rr, t: (nt - 1 - t, rr, 0),
                         memory_space=pltpu.VMEM),             # dy_f
            pl.BlockSpec((1, rt, hidden), lambda rr, t: (t, rr, 0),
                         memory_space=pltpu.VMEM),             # dy_b
            pl.BlockSpec((8 * hidden, 2 * hidden), lambda rr, t: (0, 0),
                         memory_space=pltpu.VMEM),             # whh_big^T
        ],
        out_specs=pl.BlockSpec((1, rt, 8 * hidden),
                               lambda rr, t: (nt - 1 - t, rr, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, rp, 8 * hidden), x.dtype),
        scratch_shapes=[pltpu.VMEM((rt, 2 * hidden), f32),
                        pltpu.VMEM((rt, 2 * hidden), f32)],
        interpret=interpret,
    )(gates_seq, c_seq_p, cprev_seq, dy_f, dy_b, whh_big_t)
    if rp != r:
        dgates_seq = dgates_seq[:, :r]

    dgf = dgates_seq[..., :4 * hidden]       # kernel time == original (fwd)
    dgb = dgates_seq[..., 4 * hidden:]       # kernel time == mirrored (bwd)
    dgb_orig = jnp.flip(dgb, axis=0)         # aligned with original time

    # h_prev per direction in each direction's own scan order
    hf_prev = jnp.concatenate([jnp.zeros_like(y_f[:1]), y_f[:-1]], axis=0)
    # bwd hidden at kernel step tau is y_b at original time nt-1-tau
    hb_kernel = jnp.flip(y_b, axis=0)
    hb_prev = jnp.concatenate(
        [jnp.zeros_like(hb_kernel[:1]), hb_kernel[:-1]], axis=0)

    def _dw(h_prev, dgd):
        return jnp.matmul(
            h_prev.reshape(-1, hidden).T.astype(dgd.dtype),
            dgd.reshape(-1, 4 * hidden),
            preferred_element_type=f32)

    x_flat = x.reshape(-1, c)
    dwhh_f = _dw(hf_prev, dgf).astype(fwd_p["w_hh"].dtype)
    dwhh_b = _dw(hb_prev, dgb).astype(bwd_p["w_hh"].dtype)
    dwih_f = jnp.matmul(x_flat.T, dgf.reshape(-1, 4 * hidden),
                        preferred_element_type=f32).astype(
                            fwd_p["w_ih"].dtype)
    dwih_b = jnp.matmul(x_flat.T, dgb_orig.reshape(-1, 4 * hidden),
                        preferred_element_type=f32).astype(
                            bwd_p["w_ih"].dtype)
    db_f = jnp.sum(dgf.astype(f32), axis=(0, 1)).astype(fwd_p["b"].dtype)
    db_b = jnp.sum(dgb.astype(f32), axis=(0, 1)).astype(bwd_p["b"].dtype)
    dx = (jnp.matmul(dgf, fwd_p["w_ih"].T, preferred_element_type=f32)
          + jnp.matmul(dgb_orig, bwd_p["w_ih"].T,
                       preferred_element_type=f32)).astype(x.dtype)
    return ({"w_ih": dwih_f, "w_hh": dwhh_f, "b": db_f},
            {"w_ih": dwih_b, "w_hh": dwhh_b, "b": db_b}, dx)


blstm_pallas_train.defvjp(_bpt_fwd, _bpt_bwd)
