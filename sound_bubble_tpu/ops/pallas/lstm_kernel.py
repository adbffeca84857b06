"""Pallas TPU kernel: fused bidirectional-LSTM sequence recurrence.

The intra-frequency BLSTM is the model's sequential bottleneck (145 dependent
steps per block per chunk; ~6x146 dependent steps per streaming chunk —
SURVEY §7 hard-part #2). XLA's `lax.scan` pays whole-program loop overhead
per step; this kernel runs the full recurrence in ONE kernel with weights,
h and c resident in VMEM, one MXU matmul per step:

- both directions are fused: the state is [h_fwd | h_bwd] (B, 2H) and the
  recurrent weights form a block-diagonal (2H, 8H) matrix whose columns are
  GATE-MAJOR ([i_f i_b | f_f f_b | g_f g_b | o_f o_b], 2H lanes per gate) so
  every gate activation is a contiguous 2H-lane slice;
- the input projections gates_x are precomputed outside (one big MXU matmul
  over all F) and streamed from VMEM; the backward direction's rows are
  pre-reversed so the kernel always scans forward.

Used for inference (streaming step / offline eval); training keeps the
lax.scan path (identical math, autodiff-friendly).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pack_weights(params):
    """blstm params {fwd,bwd:{w_ih,w_hh,b}} -> (w_ih_big [C, 8H],
    w_hh_big [2H, 8H], b_big [8H]) with gate-major column order."""
    fwd, bwd = params["fwd"], params["bwd"]
    h = fwd["w_hh"].shape[0]
    c = fwd["w_ih"].shape[0]

    def cols(w, gate, direction):
        return w[:, gate * h:(gate + 1) * h]

    w_ih = jnp.zeros((2, c, 8 * h), fwd["w_ih"].dtype)
    w_hh = jnp.zeros((2 * h, 8 * h), fwd["w_hh"].dtype)
    b = jnp.zeros((8 * h,), fwd["b"].dtype)
    for gate in range(4):
        lo = gate * 2 * h
        w_ih = w_ih.at[0, :, lo:lo + h].set(cols(fwd["w_ih"], gate, 0))
        w_ih = w_ih.at[1, :, lo + h:lo + 2 * h].set(cols(bwd["w_ih"], gate, 1))
        w_hh = w_hh.at[:h, lo:lo + h].set(cols(fwd["w_hh"], gate, 0))
        w_hh = w_hh.at[h:, lo + h:lo + 2 * h].set(cols(bwd["w_hh"], gate, 1))
        b = b.at[lo:lo + h].set(fwd["b"][gate * h:(gate + 1) * h])
        b = b.at[lo + h:lo + 2 * h].set(bwd["b"][gate * h:(gate + 1) * h])
    return w_ih, w_hh, b


def _kernel(gx_ref, whh_ref, y_ref, h_ref, c_ref, *, f_len, hidden, batch):
    from jax.experimental import pallas as pl

    h2 = 2 * hidden
    h_ref[:] = jnp.zeros_like(h_ref)
    c_ref[:] = jnp.zeros_like(c_ref)

    def step(f, _):
        gates = gx_ref[f] + jnp.dot(h_ref[:], whh_ref[:],
                                    preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0:h2])
        fg = jax.nn.sigmoid(gates[:, h2:2 * h2])
        g = jnp.tanh(gates[:, 2 * h2:3 * h2])
        o = jax.nn.sigmoid(gates[:, 3 * h2:])
        c = fg * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h
        y_ref[f] = h
        return 0

    jax.lax.fori_loop(0, f_len, step, 0)


def blstm_pallas(params, x, interpret: bool = False):
    """Fused BLSTM over axis -2. x: [B, F, C] -> [B, F, 2H].

    Numerically identical to `ops.rnn.blstm` (same cell math, fp32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, c = x.shape
    hidden = params["fwd"]["w_hh"].shape[0]
    w_ih, w_hh, bias = _pack_weights(params)

    # input projections for both directions, gate-major; bwd rows reversed
    gx_f = x @ w_ih[0]
    gx_b = jnp.flip(x, axis=-2) @ w_ih[1]
    gx = (gx_f + gx_b + bias)  # disjoint column supports -> simple add
    gx = jnp.moveaxis(gx, 1, 0)  # [F, B, 8H]

    y = pl.pallas_call(
        functools.partial(_kernel, f_len=f, hidden=hidden, batch=b),
        out_shape=jax.ShapeDtypeStruct((f, b, 2 * hidden), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, 2 * hidden), x.dtype),
                        pltpu.VMEM((b, 2 * hidden), x.dtype)],
        interpret=interpret,
    )(gx, w_hh)

    y = jnp.moveaxis(y, 0, 1)  # [B, F, 2H]
    y_fwd = y[..., :hidden]
    y_bwd = jnp.flip(y[..., hidden:], axis=-2)
    return jnp.concatenate([y_fwd, y_bwd], axis=-1)
