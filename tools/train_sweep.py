"""Training-step + datagen sweep harness (run on a free TPU chip).

Times the production train step (same jit as src/train_stream.py --bf16)
over a (batch, SB_LSTM_CHUNK) grid, and optionally the on-device datagen
(`campaign.make_batch`) with different fft_conv sizes. One JSON line per
cell so runs are resumable/parseable.

  python tools/train_sweep.py --batches 8,12 --chunks 6,8 --steps 6
  python tools/train_sweep.py --datagen --batches 8

Context: TPU v5e round-3 numbers (batch 8, bf16): autodiff 254.5 ms,
fused+chunk6 157.2 ms (bench.py history); campaign step incl. datagen
240 ms => datagen ~80 ms. Target: train_ingest >= 150x realtime
(VERDICT r2 #3), i.e. <= 133 ms/step at batch 8 x 2.5 s.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def time_train_step(batch, chunk, seconds=2.5, steps=6, dirfuse=False,
                    chunk_bwd=0, slab=False, slab_k=0, slab_rows=0):
    import jax
    import jax.numpy as jnp
    import optax

    import sound_bubble_tpu.ops.rnn as rnn
    from __graft_entry__ import PROD_MODEL
    from sound_bubble_tpu.losses.snrlp import SNRLPLoss
    from sound_bubble_tpu.models.tfgridnet.model import make_net
    from sound_bubble_tpu.utils import cast_bf16

    rnn.set_fused_scan(True)
    rnn.set_dir_fuse(dirfuse)
    rnn.set_slab(slab)
    rnn._FUSED_CHUNK = chunk
    rnn._FUSED_CHUNK_BWD = chunk_bwd or None
    if slab:
        from sound_bubble_tpu.ops.pallas import lstm_train_slab
        if slab_k:
            lstm_train_slab._K = slab_k
        lstm_train_slab._ROW_TILE = slab_rows

    net = make_net({**PROD_MODEL, "compute_dtype": "bf16"})
    n = int(seconds * 24000)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, net.cfg.num_ch, n))
                    .astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((batch, 1, n)).astype(np.float32))
    emb = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (batch, 1))
    inputs = {"mixture": x, "dis_embed": emb}
    params = net.init(jax.random.PRNGKey(0), inputs)["params"]
    loss_fn = SNRLPLoss("snr", neg_weight=100)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1.2e-3))
    opt_state = tx.init(params)

    def step(params, opt_state):
        def lf(p):
            est = net.apply({"params": cast_bf16(p)}, inputs)["output"]
            return jnp.mean(loss_fn(est=est.astype(jnp.float32), gt=gt))
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    run = jax.jit(step, donate_argnums=(0, 1))
    p, o, loss = run(params, opt_state)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, loss = run(p, o)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / steps * 1e3


def time_datagen(batch, seconds=2.5, steps=10, pool_n=64, bg=False):
    """make_batch alone (jitted), with the pool resident on device."""
    import jax
    import jax.numpy as jnp

    from sound_bubble_tpu.datagen import campaign

    pool, _ = campaign.build_pool(pool_n, seed=0, sr=24000, rir_len=12000,
                                  order_range=(10, 32), dtype=jnp.float32,
                                  bg_noise=bg)

    def gen(key, idx):
        inputs, targets = campaign.make_batch(
            key, pool, idx, n_samples=int(seconds * 24000), sr=24000,
            voice="mix", bg_noise_p=0.5 if bg else 0.0)
        return inputs["mixture"], targets["target"]

    jgen = jax.jit(gen)
    key = jax.random.PRNGKey(0)
    idx = jnp.arange(batch) % pool_n
    jax.block_until_ready(jgen(key, idx)[0])
    t0 = time.perf_counter()
    out = None
    for i in range(steps):
        out = jgen(jax.random.fold_in(key, i), idx)
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,12")
    ap.add_argument("--chunks", default="6,8")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=2.5)
    ap.add_argument("--datagen", action="store_true")
    ap.add_argument("--bg", action="store_true",
                    help="time the bg-noise datagen path (5-slot pool)")
    ap.add_argument("--dirfuse", default="0,1",
                    help="comma list of 0/1: sweep SB_BLSTM_DIRFUSE")
    ap.add_argument("--chunks_bwd", default="0",
                    help="comma list; 0 = same as forward chunk")
    ap.add_argument("--slab", action="store_true",
                    help="route the LSTM scans through the slab-grid "
                         "Pallas kernels (SB_LSTM_SLAB)")
    ap.add_argument("--slab_ks", default="8",
                    help="comma list of slab frame counts (SB_SLAB_K)")
    ap.add_argument("--slab_rows", type=int, default=0,
                    help="slab row-tile override (0 = auto)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    for b in [int(v) for v in args.batches.split(",")]:
        if args.datagen:
            ms = time_datagen(b, seconds=args.seconds, steps=args.steps,
                              bg=args.bg)
            print(json.dumps({"what": "datagen", "batch": b, "bg": args.bg,
                              "ms": round(ms, 1)}), flush=True)
            continue
        for k in [int(v) for v in args.chunks.split(",")]:
          for kb in [int(v) for v in args.chunks_bwd.split(",")]:
            for df in [v == "1" for v in args.dirfuse.split(",")]:
              for sk in [int(v) for v in args.slab_ks.split(",")]:
                ms = time_train_step(b, k, seconds=args.seconds,
                                     steps=args.steps, dirfuse=df,
                                     chunk_bwd=kb, slab=args.slab,
                                     slab_k=sk, slab_rows=args.slab_rows)
                ingest = b * args.seconds / (ms / 1e3)
                rec = {"what": "train", "batch": b, "chunk": k,
                       "chunk_bwd": kb or k, "dirfuse": df,
                       "ms": round(ms, 1), "ingest_x_rt": round(ingest, 1)}
                if args.slab:
                    rec.update(slab=True, slab_k=sk,
                               slab_rows=args.slab_rows)
                print(json.dumps(rec), flush=True)
                if not args.slab:
                    break


if __name__ == "__main__":
    main()
