"""Streaming inference: the 8 ms-chunk loop as a jitted stateful step.

Mirrors `/root/reference/edge/causal_infer.py` (`ModelWrapper.feed` +
`streaming_inference`), TPU-native: the chunk step is one jitted program with
DONATED state buffers (no copies between chunks), fixed shapes, and an
optional on-device `lax.scan` fast path for processing many queued chunks in
a single dispatch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import init_state


class ModelWrapper:
    """Stateful streaming wrapper around a (net, params) pair or a PLModule
    ModelHandle. `feed(mix)` threads internal state across calls."""

    def __init__(self, mdl, params=None):
        if params is None:  # a PLModule ModelHandle
            self._net = mdl._module.net
            self._params = mdl._module.params
        else:
            self._net = mdl
            self._params = params
        self.cfg = self._net.cfg
        self.internal_state = None
        net = self._net

        def step(params, inputs, state, pad):
            out = net.apply({"params": params}, inputs, state, pad)
            return out["output"], out["next_state"]

        self._step = jax.jit(step, static_argnames=("pad",),
                             donate_argnums=(2,))

    def eval(self):
        return self

    def reset(self):
        self.internal_state = None

    def feed(self, mix, dis_embed=None, pad=False):
        mix = jnp.asarray(np.asarray(mix, np.float32))
        if self.internal_state is None:
            self.internal_state = init_state(self.cfg, mix.shape[0])
        inputs = {"mixture": mix}
        if self.cfg.conditional:
            if dis_embed is None:
                dis_embed = jnp.asarray([[0.0, 0.0, 1.0]])
            inputs["dis_embed"] = jnp.asarray(np.asarray(dis_embed, np.float32))
        out, self.internal_state = self._step(self._params, inputs,
                                              self.internal_state, False)
        return out


def streaming_inference(mdl: ModelWrapper, x, chunk_size: int,
                        pad_length: int, dis_embed=None):
    """Chunk-by-chunk rolling-window loop (reference semantics: the signal is
    n_chunks*chunk + pad samples; window = [past chunk tail | new chunk])."""
    x = jnp.asarray(np.asarray(x, np.float32))
    num_samples = x.shape[-1]
    window = jnp.zeros((x.shape[0], x.shape[1], chunk_size + pad_length),
                       x.dtype)
    if pad_length:
        window = window.at[..., -pad_length:].set(x[..., :pad_length])
    outputs = []
    for i in range(pad_length, num_samples - chunk_size + 1, chunk_size):
        window = jnp.roll(window, -chunk_size, axis=-1)
        window = window.at[..., -chunk_size:].set(x[..., i:i + chunk_size])
        outputs.append(mdl.feed(window, dis_embed))
    return jnp.concatenate(outputs, axis=-1)


def streaming_inference_scan(net, params, x, chunk_size: int, pad_length: int,
                             dis_embed=None):
    """Whole-signal streaming in ONE device dispatch: windows precomputed,
    chunks chained with lax.scan (numerically identical to the python loop).
    This is the TPU serving fast path (host dispatch ~40x the chunk compute)."""
    x = jnp.asarray(np.asarray(x, np.float32))
    b, m, n = x.shape
    n_chunks = (n - pad_length) // chunk_size
    idx = np.arange(n_chunks) * chunk_size
    windows = jnp.stack([
        x[..., i:i + chunk_size + pad_length] for i in idx], axis=0)
    emb = None
    if net.cfg.conditional:
        emb = (jnp.asarray([[0.0, 0.0, 1.0]]) if dis_embed is None
               else jnp.asarray(np.asarray(dis_embed, np.float32)))

    def body(st, win):
        inputs = {"mixture": win}
        if emb is not None:
            inputs["dis_embed"] = emb
        out = net.apply({"params": params}, inputs, st, pad=False)
        return out["next_state"], out["output"]

    state = init_state(net.cfg, b)
    # serving is forward-only, where the direction-fused BLSTM scan halves
    # lax.scan iteration count for ~10% throughput (batch-512 bf16 chunk
    # 3.336 -> 2.998 ms measured on TPU v5e; training is bwd-dominated so
    # the same fusion is neutral there and stays opt-in) — trace this scan
    # with dir-fuse on, restoring the caller's flag after
    from sound_bubble_tpu.ops import rnn as _rnn
    old_df = _rnn._DIR_FUSE
    _rnn.set_dir_fuse(True)
    try:
        _, ys = jax.lax.scan(body, state, windows)      # [N, B, S, chunk]
    finally:
        _rnn.set_dir_fuse(old_df)
    return jnp.moveaxis(ys, 0, -2).reshape(b, ys.shape[2], -1)
