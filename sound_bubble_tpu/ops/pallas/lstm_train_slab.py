"""Pallas TPU kernels: slab-grid LSTM training scans (fwd + bwd).

Round-4 successor to lstm_train_kernel.py. That kernel ran ONE timestep per
grid step and kept XLA's residual layout (it saved post-nonlinearity gates
[T, R, 4H] and stacked dgates [T, R, 4H]) — measured throughput-neutral on
the production train step because the scan's HBM stacking traffic and
per-step overhead were unchanged (TODO.md round-3 measurements). This kernel
attacks exactly those two costs:

- **slab grid**: K frames per grid step (grid = (row_tiles, ceil(T/K)),
  time innermost). The (h, c) carry — and in the backward the (dh, dc)
  cotangent carry AND the (dW_ih, dW_hh, db) accumulators — live in VMEM
  across the whole grid, so there are NO carry copies and NO per-frame
  dynamic-update-slices: every HBM stream moves as one [K, rt, ·] slab
  through the sequential grid's double-buffered pipeline.
- **minimal residuals**: the forward saves only `ys` (the model needs it
  anyway) and a per-slab cell-state checkpoint `c_ckpt [nb, R, H]` — K x
  less HBM than the f32 `c_prev` stream the fused XLA scan stacks, and no
  gates residual at all. The backward re-forwards the cell states WITHIN a
  slab from the checkpoint: since h_prev for every frame is an input
  (ys shifted by one), the gate pre-activations for ALL K frames batch into
  TWO large MXU matmuls ([K*rt, C] @ [C, 4H] and [K*rt, H] @ [H, 4H]) —
  the only sequential work left is the elementwise c recurrence and the
  dh chain's [rt, 4H] @ [4H, H] per frame.
- **in-kernel weight grads**: dW_ih / dW_hh / db accumulate into
  constant-index-map output refs (resident in VMEM, flushed once), batched
  per slab as [C, K*rt] @ [K*rt, 4H] — dgates_seq never exists in HBM.

Gate math and dtype choreography replicate ops/rnn.py's fused-scan path
(`_fused_gate_fwd` / `_lstm_fused_bwd`) op for op: bf16 weights/activations
with f32 carries and f32 matmul accumulation in the mixed mode, pure f32
otherwise. Grads are checked against autodiff and against the XLA fused
scan in tests/test_lstm_slab.py (interpret mode on CPU; the same kernels
lower to Mosaic on TPU).

Reference anchor: the recurrences this accelerates implement the BLSTM /
inter-LSTM of `/root/reference/src/models/
tfgridnet_realtime_clean_dis_embd3/tfgridnet_causal.py:800-849`.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp


_K = int(os.environ.get("SB_SLAB_K", "8"))        # frames per grid step
_ROW_TILE = int(os.environ.get("SB_SLAB_ROWS", "0"))  # 0 = auto
# Mosaic's default scoped-VMEM budget is ~16 MB — v5e has 128 MB/core. The
# backward's batched f32 gate temporaries ([K*rt, 4H]) overflow the default
# at production row counts (measured +0.9 MB at rt=640, K=8, H=64), so both
# kernels request a larger budget explicitly.
_VMEM_MB = int(os.environ.get("SB_SLAB_VMEM_MB", "96"))


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_MB * 1024 * 1024)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sig(v):
    """sigmoid with XLA's bf16 semantics (upcast -> f32 op -> round), made
    explicit: Mosaic cannot lower `logistic` directly on bf16 vectors (the
    f32 splat constants inside fail element-type verification)."""
    if v.dtype == jnp.float32:
        return jax.nn.sigmoid(v)
    return jax.nn.sigmoid(v.astype(jnp.float32)).astype(v.dtype)


def _tanh(v):
    if v.dtype == jnp.float32:
        return jnp.tanh(v)
    return jnp.tanh(v.astype(jnp.float32)).astype(v.dtype)


def _row_tile(r: int) -> int:
    if _ROW_TILE:
        return _ROW_TILE
    if r <= 768:
        return _round_up(r, 16)
    return 640


# ----------------------------- forward -----------------------------


def _fwd_kernel(x_ref, wih_ref, whh_ref, b_ref, h0_ref, c0_ref,
                y_ref, ck_ref, hT_ref, cT_ref, h_s, c_s,
                *, k_frames, t_len, hidden, mixed, reverse):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    nb = pl.num_programs(1)
    f32 = jnp.float32
    blk = (nb - 1 - j) if reverse else j

    @pl.when(j == 0)
    def _():
        h_s[:] = h0_ref[:].astype(f32)
        c_s[:] = c0_ref[:].astype(f32)

    # slab-start checkpoint: the carry ENTERING this slab's first processed
    # frame (the backward re-forwards the slab's cell states from it)
    ck_ref[0] = c_s[:]

    # one batched input projection for the whole slab
    x_blk = x_ref[:]                                    # [K, rt, C]
    kb = x_blk.shape[0] * x_blk.shape[1]
    gx = jnp.dot(x_blk.reshape(kb, -1), wih_ref[:],
                 preferred_element_type=f32)
    gx = (gx.reshape(x_blk.shape[0], x_blk.shape[1], -1)
          + b_ref[:].astype(f32))

    order = range(k_frames - 1, -1, -1) if reverse else range(k_frames)
    for k in order:
        t_abs = blk * k_frames + k
        valid = t_abs < t_len
        if mixed:
            gates = (gx[k] + jnp.dot(h_s[:].astype(jnp.bfloat16), whh_ref[:],
                                     preferred_element_type=f32)
                     ).astype(jnp.bfloat16)
        else:
            gates = gx[k] + jnp.dot(h_s[:], whh_ref[:],
                                    preferred_element_type=f32)
        i = _sig(gates[:, :hidden])
        f = _sig(gates[:, hidden:2 * hidden])
        g = _tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sig(gates[:, 3 * hidden:])
        c_t = (f.astype(f32) * c_s[:]) + (i * g).astype(f32)
        h_t = o * _tanh(c_t.astype(gates.dtype))
        y_ref[k] = h_t.astype(y_ref.dtype)
        # padded frames (t_abs >= T) pass the carry through unchanged
        h_s[:] = jnp.where(valid, h_t.astype(f32), h_s[:])
        c_s[:] = jnp.where(valid, c_t, c_s[:])

    # constant-index-map outputs: resident in VMEM, the last grid step's
    # value per row tile is what lands in HBM
    hT_ref[:] = h_s[:]
    cT_ref[:] = c_s[:]


def lstm_slab_fwd(w_ih, w_hh, b, x, h0, c0, reverse, *, interpret=None):
    """Fused slab-grid LSTM forward over scan-major x [T, R, C].

    Returns (ys [T, R, H] x.dtype, hT [R, H] f32, cT [R, H] f32,
    c_ckpt [nb, R, H] f32 slab-entry cell states).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_len, r, c = x.shape
    hidden = w_hh.shape[0]
    mixed = w_hh.dtype == jnp.bfloat16 or x.dtype == jnp.bfloat16
    f32 = jnp.float32

    k_frames = min(_K, t_len)
    nb = -(-t_len // k_frames)
    tp = nb * k_frames
    rt = _row_tile(r)
    rp = _round_up(r, rt)
    if tp != t_len or rp != r:
        x = jnp.pad(x, ((0, tp - t_len), (0, rp - r), (0, 0)))
    if rp != r:
        h0 = jnp.pad(h0, ((0, rp - r), (0, 0)))
        c0 = jnp.pad(c0, ((0, rp - r), (0, 0)))
    b2 = b.reshape(1, 4 * hidden)

    def bmap(j):
        return (nb - 1 - j) if reverse else j

    grid = (rp // rt, nb)
    ys, c_ckpt, hT, cT = pl.pallas_call(
        functools.partial(_fwd_kernel, k_frames=k_frames, t_len=t_len,
                          hidden=hidden, mixed=mixed, reverse=reverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_frames, rt, c),
                         lambda rr, j: (bmap(j), rr, 0),
                         memory_space=pltpu.VMEM),            # x slab
            pl.BlockSpec((c, 4 * hidden), lambda rr, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), lambda rr, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), lambda rr, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, hidden), lambda rr, j: (rr, 0),
                         memory_space=pltpu.VMEM),            # h0
            pl.BlockSpec((rt, hidden), lambda rr, j: (rr, 0),
                         memory_space=pltpu.VMEM),            # c0
        ],
        out_specs=(
            pl.BlockSpec((k_frames, rt, hidden),
                         lambda rr, j: (bmap(j), rr, 0),
                         memory_space=pltpu.VMEM),            # ys slab
            pl.BlockSpec((1, rt, hidden),
                         lambda rr, j: (bmap(j), rr, 0),
                         memory_space=pltpu.VMEM),            # c_ckpt
            pl.BlockSpec((rt, hidden), lambda rr, j: (rr, 0),
                         memory_space=pltpu.VMEM),            # hT
            pl.BlockSpec((rt, hidden), lambda rr, j: (rr, 0),
                         memory_space=pltpu.VMEM),            # cT
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, rp, hidden), x.dtype),
            jax.ShapeDtypeStruct((nb, rp, hidden), f32),
            jax.ShapeDtypeStruct((rp, hidden), f32),
            jax.ShapeDtypeStruct((rp, hidden), f32),
        ),
        scratch_shapes=[pltpu.VMEM((rt, hidden), f32),
                        pltpu.VMEM((rt, hidden), f32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, w_ih, w_hh, b2, h0, c0)
    return ys[:t_len, :r], hT[:r], cT[:r], c_ckpt[:, :r]


# ----------------------------- backward -----------------------------


def _bwd_kernel(x_ref, hp_ref, ck_ref, dy_ref, wih_ref, whh_ref, b_ref,
                whht_ref, wiht_ref, dhT_ref, dcT_ref,
                dx_ref, dwih_ref, dwhh_ref, db_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, g_s, c_s,
                *, k_frames, t_len, hidden, mixed, reverse):
    """Grid step jj processes the slab the forward processed at step
    nb-1-jj. Phase A re-forwards the slab's cell states from the checkpoint
    (gates for all K frames batch into two MXU matmuls — h_prev is an
    input); phase B walks the frames in reverse computing dgates and the
    (dh, dc) chain; the dx / dW reductions batch per slab."""
    from jax.experimental import pallas as pl

    jj = pl.program_id(1)
    rr = pl.program_id(0)
    nb = pl.num_programs(1)
    n_rt = pl.num_programs(0)
    f32 = jnp.float32
    gdt = jnp.bfloat16 if mixed else f32
    mdt = jnp.bfloat16 if mixed else f32
    blk = jj if reverse else (nb - 1 - jj)

    @pl.when(jnp.logical_and(jj == 0, rr == 0))
    def _():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(jj == 0)
    def _():
        dh_s[:] = dhT_ref[:].astype(f32)
        dc_s[:] = dcT_ref[:].astype(f32)

    x_blk = x_ref[:]                                    # [K, rt, C]
    hp_blk = hp_ref[:]                                  # [K, rt, H] mdt
    kb = x_blk.shape[0] * x_blk.shape[1]

    # ---- phase A: batched gate recompute + elementwise c re-forward ----
    gx = (jnp.dot(x_blk.reshape(kb, -1), wih_ref[:],
                  preferred_element_type=f32)
          + jnp.dot(hp_blk.reshape(kb, -1), whh_ref[:],
                    preferred_element_type=f32))
    gx = gx.reshape(x_blk.shape[0], x_blk.shape[1], -1)
    if mixed:
        gates_all = (gx + b_ref[:].astype(f32)).astype(jnp.bfloat16)
    else:
        gates_all = gx + b_ref[:]

    c = ck_ref[0]                                       # slab-entry carry
    orderA = range(k_frames - 1, -1, -1) if reverse else range(k_frames)
    for k in orderA:
        t_abs = blk * k_frames + k
        valid = t_abs < t_len
        gk = gates_all[k]
        i = _sig(gk[:, :hidden])
        f = _sig(gk[:, hidden:2 * hidden])
        g = _tanh(gk[:, 2 * hidden:3 * hidden])
        # c_prev for this frame is the running carry — stash it (the
        # f-gate gradient needs it); gates stash in g_s (phase B overwrites
        # each frame's slot with its dgates once consumed)
        c_s[k] = c
        c_t = (f.astype(f32) * c) + (i * g).astype(f32)
        c = jnp.where(valid, c_t, c)
        g_s[k] = gk

    # ---- phase B: reverse walk, dgates + (dh, dc) chain ----
    # processed in reverse of phase A's order
    orderB = range(k_frames) if reverse else range(k_frames - 1, -1, -1)
    for k in orderB:
        t_abs = blk * k_frames + k
        valid = t_abs < t_len
        gk = g_s[k]
        i = _sig(gk[:, :hidden]).astype(f32)
        f = _sig(gk[:, hidden:2 * hidden]).astype(f32)
        g = _tanh(gk[:, 2 * hidden:3 * hidden]).astype(f32)
        o = _sig(gk[:, 3 * hidden:]).astype(f32)
        cp = c_s[k]
        c_t = (f * cp) + i * g
        tc = _tanh(c_t.astype(gdt)).astype(f32)
        dh = dy_ref[k].astype(f32) + dh_s[:]
        do = dh * tc
        dc = dc_s[:] + dh * o * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * g * i * (1.0 - i),
            dc * cp * f * (1.0 - f),
            dc * i * (1.0 - g * g),
            do * o * (1.0 - o)], axis=-1)
        dgates = jnp.where(valid, dgates, jnp.zeros_like(dgates))
        dg_m = dgates.astype(mdt)
        db_ref[:] = db_ref[:] + jnp.sum(dgates, axis=0, keepdims=True)
        dh_prev = jnp.dot(dg_m, whht_ref[:], preferred_element_type=f32)
        dh_s[:] = jnp.where(valid, dh_prev, dh_s[:])
        dc_s[:] = jnp.where(valid, dc * f, dc_s[:])
        g_s[k] = dg_m                                  # reuse: now dgates

    # ---- batched slab reductions (dgates live in g_s) ----
    dg_blk = g_s[:].reshape(kb, 4 * hidden)
    dx = jnp.dot(dg_blk, wiht_ref[:], preferred_element_type=f32)
    dx_ref[:] = dx.reshape(x_blk.shape).astype(dx_ref.dtype)
    dwih_ref[:] = dwih_ref[:] + jnp.dot(
        x_blk.reshape(kb, -1).astype(mdt).T, dg_blk,
        preferred_element_type=f32)
    dwhh_ref[:] = dwhh_ref[:] + jnp.dot(
        hp_blk.reshape(kb, -1).T, dg_blk, preferred_element_type=f32)

    dh0_ref[:] = dh_s[:]
    dc0_ref[:] = dc_s[:]


def lstm_slab_bwd(w_ih, w_hh, b, x, hp, c_ckpt, dy, dhT, dcT, reverse,
                  *, interpret=None):
    """Backward pass. x [T, R, C]; hp [T, R, H] (h entering each frame, in
    the recurrence-matmul dtype); c_ckpt [nb, R, H] f32; dy [T, R, H].

    Returns (dx [T, R, C] x.dtype, dw_ih f32, dw_hh f32, db f32,
    dh0 [R, H] f32, dc0 [R, H] f32).
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

    k_frames = min(_K, t_len)
    nb = -(-t_len // k_frames)
    assert c_ckpt.shape[0] == nb, (c_ckpt.shape, nb)
    tp = nb * k_frames
    rt = _row_tile(r)
    rp = _round_up(r, rt)
    if tp != t_len or rp != r:
        pad3 = ((0, tp - t_len), (0, rp - r), (0, 0))
        x = jnp.pad(x, pad3)
        hp = jnp.pad(hp, pad3)
        dy = jnp.pad(dy, pad3)
    if rp != r:
        c_ckpt = jnp.pad(c_ckpt, ((0, 0), (0, rp - r), (0, 0)))
        dhT = jnp.pad(dhT, ((0, rp - r), (0, 0)))
        dcT = jnp.pad(dcT, ((0, rp - r), (0, 0)))
    b2 = b.reshape(1, 4 * hidden)

    def blk_of(jj):
        return jj if reverse else (nb - 1 - jj)

    grid = (rp // rt, nb)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, k_frames=k_frames, t_len=t_len,
                          hidden=hidden, mixed=mixed, reverse=reverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_frames, rt, c),
                         lambda rr, jj: (blk_of(jj), rr, 0),
                         memory_space=pltpu.VMEM),            # x
            pl.BlockSpec((k_frames, rt, hidden),
                         lambda rr, jj: (blk_of(jj), rr, 0),
                         memory_space=pltpu.VMEM),            # h_prev
            pl.BlockSpec((1, rt, hidden),
                         lambda rr, jj: (blk_of(jj), rr, 0),
                         memory_space=pltpu.VMEM),            # c_ckpt
            pl.BlockSpec((k_frames, rt, hidden),
                         lambda rr, jj: (blk_of(jj), rr, 0),
                         memory_space=pltpu.VMEM),            # dy
            pl.BlockSpec((c, 4 * hidden), lambda rr, jj: (0, 0),
                         memory_space=pltpu.VMEM),            # w_ih
            pl.BlockSpec((hidden, 4 * hidden), lambda rr, jj: (0, 0),
                         memory_space=pltpu.VMEM),            # w_hh
            pl.BlockSpec((1, 4 * hidden), lambda rr, jj: (0, 0),
                         memory_space=pltpu.VMEM),            # b
            pl.BlockSpec((4 * hidden, hidden), lambda rr, jj: (0, 0),
                         memory_space=pltpu.VMEM),            # w_hh^T
            pl.BlockSpec((4 * hidden, c), lambda rr, jj: (0, 0),
                         memory_space=pltpu.VMEM),            # w_ih^T
            pl.BlockSpec((rt, hidden), lambda rr, jj: (rr, 0),
                         memory_space=pltpu.VMEM),            # dhT
            pl.BlockSpec((rt, hidden), lambda rr, jj: (rr, 0),
                         memory_space=pltpu.VMEM),            # dcT
        ],
        out_specs=(
            pl.BlockSpec((k_frames, rt, c),
                         lambda rr, jj: (blk_of(jj), rr, 0),
                         memory_space=pltpu.VMEM),            # dx
            pl.BlockSpec((c, 4 * hidden), lambda rr, jj: (0, 0),
                         memory_space=pltpu.VMEM),            # dw_ih
            pl.BlockSpec((hidden, 4 * hidden), lambda rr, jj: (0, 0),
                         memory_space=pltpu.VMEM),            # dw_hh
            pl.BlockSpec((1, 4 * hidden), lambda rr, jj: (0, 0),
                         memory_space=pltpu.VMEM),            # db
            pl.BlockSpec((rt, hidden), lambda rr, jj: (rr, 0),
                         memory_space=pltpu.VMEM),            # dh0
            pl.BlockSpec((rt, hidden), lambda rr, jj: (rr, 0),
                         memory_space=pltpu.VMEM),            # dc0
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, rp, c), x.dtype),
            jax.ShapeDtypeStruct((c, 4 * hidden), f32),
            jax.ShapeDtypeStruct((hidden, 4 * hidden), f32),
            jax.ShapeDtypeStruct((1, 4 * hidden), f32),
            jax.ShapeDtypeStruct((rp, hidden), f32),
            jax.ShapeDtypeStruct((rp, hidden), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rt, hidden), f32),                    # dh
            pltpu.VMEM((rt, hidden), f32),                    # dc
            pltpu.VMEM((k_frames, rt, 4 * hidden), gdt),      # gates/dgates
            pltpu.VMEM((k_frames, rt, hidden), f32),          # c_prev
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, hp, c_ckpt, dy, w_ih, w_hh, b2, w_hh.T, w_ih.T, dhT, dcT)
    dx, dwih, dwhh, db, dh0, dc0 = out
    return dx[:t_len, :r], dwih, dwhh, db[0], dh0[:r], dc0[:r]


# ------------------------- custom-VJP wrapper -------------------------


def _shift_prev(ys, h0, reverse, mdt):
    """h entering each frame from the stacked outputs (ops.rnn contract)."""
    h0r = h0[None].astype(ys.dtype)
    if reverse:
        shifted = jnp.concatenate([ys[1:], h0r], axis=0)
    else:
        shifted = jnp.concatenate([h0r, ys[:-1]], axis=0)
    return shifted.astype(mdt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def lstm_slab(reverse, w_ih, w_hh, b, x, h0, c0):
    """(ys [T, R, H] x.dtype, hT, cT) — scan-major x [T, R, C]. Drop-in
    for ops.rnn.lstm_fused with the scans as slab-grid Pallas kernels."""
    ys, hT, cT, _ = lstm_slab_fwd(w_ih, w_hh, b, x, h0, c0, reverse)
    return ys, hT.astype(h0.dtype), cT.astype(c0.dtype)


def _slab_fwd(reverse, w_ih, w_hh, b, x, h0, c0):
    ys, hT, cT, c_ckpt = lstm_slab_fwd(w_ih, w_hh, b, x, h0, c0, reverse)
    out = (ys, hT.astype(h0.dtype), cT.astype(c0.dtype))
    return out, (w_ih, w_hh, b, x, h0, c0, ys, c_ckpt)


def _slab_bwd(reverse, res, cts):
    w_ih, w_hh, b, x, h0, c0, ys, c_ckpt = res
    dy, dhT, dcT = cts
    mdt = w_hh.dtype
    hp = _shift_prev(ys, h0, reverse, mdt)
    dx, dwih, dwhh, db, dh0, dc0 = lstm_slab_bwd(
        w_ih, w_hh, b, x, hp, c_ckpt, dy, dhT, dcT, reverse)
    return (dwih.astype(w_ih.dtype), dwhh.astype(w_hh.dtype),
            db.astype(b.dtype), dx, dh0.astype(h0.dtype),
            dc0.astype(c0.dtype))


lstm_slab.defvjp(_slab_fwd, _slab_bwd)
