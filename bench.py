"""Streaming RTF benchmark — prints ONE JSON line.

Measures the production model's per-8ms-chunk streaming step on the attached
accelerator. The chunks are chained with `lax.scan` inside one jitted program
(the state dependency makes this the honest single-stream streaming measure,
and keeps host<->device dispatch out of the number — the axon tunnel adds
~40 ms per dispatch, see .claude/skills/verify/SKILL.md).

Baseline: the reference runs 6.36 ms compute per 8 ms chunk on its embedded
CPU (README.md:9) => RTF 1.258x. vs_baseline = our_rtf / 1.258.
"""
from __future__ import annotations

import json
import time

import numpy as np


# Concurrent streams per chip in throughput mode. Sweep on a v5e chip
# (2026-08-17): batch 32 -> 1.03 ms/batched chunk (248x RT), 128 -> 1.29 ms
# (792x), 256 -> 2.13 ms (960x, still 3.7x under the 8 ms deadline).
SERVING_BATCH = 256


def _measure(net, cfg, batch, n_chunks=125, repeats=5, bf16=False, outer=3):
    import jax
    import jax.numpy as jnp

    from sound_bubble_tpu.models.tfgridnet.model import init_state
    from sound_bubble_tpu.utils import cast_bf16

    chunk, pad = cfg.stft_chunk_size, cfg.stft_pad_size
    rng = np.random.default_rng(0)
    windows = jnp.asarray(rng.standard_normal(
        (n_chunks, batch, cfg.num_ch, chunk + pad)).astype(np.float32))
    emb = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (batch, 1))
    variables = net.init(jax.random.PRNGKey(0),
                         {"mixture": windows[0], "dis_embed": emb})
    if bf16:
        # bf16 serving: params + trunk bf16 (net must be built with
        # cfg.compute_dtype="bf16"); the waveform/STFT/feature front-end
        # stays fp32 so the log-ratio ILD/IPD features are not quantized
        variables = {"params": cast_bf16(variables["params"])}
    state0 = init_state(cfg, batch,
                        jnp.bfloat16 if bf16 else jnp.float32)

    def scan_stream(params, windows, state):
        def body(st, win):
            out = net.apply({"params": params},
                            {"mixture": win, "dis_embed": emb}, st, pad=False)
            return out["next_state"], out["output"]

        return jax.lax.scan(body, state, windows)

    run = jax.jit(scan_stream)
    jax.block_until_ready(run(variables["params"], windows, state0)[1])
    # pipeline the repeats (block once at the end): the host<->device tunnel
    # adds ~20-40 ms per blocking round-trip, which is dispatch overhead, not
    # streaming compute — chained dispatches keep the device saturated.
    # `outer` independent timed runs, min-of-N like the reference's latency
    # harness (edge/check_runtime.py 10-run min) so a noisy tunnel sample is
    # distinguishable from a real regression (VERDICT r4 #6); the spread is
    # surfaced through _SPREADS.
    means = []
    for _ in range(outer):
        t0 = time.perf_counter()
        ys = None
        for _ in range(repeats):
            _, ys = run(variables["params"], windows, state0)
        jax.block_until_ready(ys)
        means.append((time.perf_counter() - t0) / repeats / n_chunks * 1e3)
    _SPREADS[f"b{batch}{'_bf16' if bf16 else ''}"] = (
        round(min(means), 4), round(max(means), 4))
    return min(means)  # ms per chunk step


# per-measurement (min, max) over the outer timing runs, keyed by batch/tag
_SPREADS: dict = {}


def _measure_fused(net, cfg, n_chunks=125, repeats=5):
    """Single-stream latency through the fused whole-stack Pallas kernel
    (runtime/fast_path.py); returns None when the config is unsupported or
    the kernel fails to lower on this backend."""
    import jax
    import jax.numpy as jnp

    from sound_bubble_tpu.models.tfgridnet.model import init_state
    from sound_bubble_tpu.runtime.fast_path import FusedStreamer

    chunk, pad = cfg.stft_chunk_size, cfg.stft_pad_size
    rng = np.random.default_rng(0)
    windows = jnp.asarray(rng.standard_normal(
        (n_chunks, 1, cfg.num_ch, chunk + pad)).astype(np.float32))
    emb = jnp.asarray([[0.0, 0.0, 1.0]])
    variables = net.init(jax.random.PRNGKey(0),
                         {"mixture": windows[0], "dis_embed": emb})
    try:
        fs = FusedStreamer(net, variables["params"], dis_embed=emb)

        def run(windows, state, film):
            def body(st, win):
                y, st2 = fs._step_impl(win, st, film)
                return st2, y
            return jax.lax.scan(body, state, windows)

        jrun = jax.jit(run)
        state0 = init_state(cfg, 1)
        jax.block_until_ready(jrun(windows, state0, fs._film)[1])
        means = []
        for _ in range(3):
            t0 = time.perf_counter()
            ys = None
            for _ in range(repeats):
                _, ys = jrun(windows, state0, fs._film)
            jax.block_until_ready(ys)
            means.append((time.perf_counter() - t0) / repeats / n_chunks * 1e3)
        return min(means)
    except Exception:
        return None


def _measure_train(net, cfg, batch=8, seconds=2.5, steps=8):
    """Full production train step (SNRLP loss + grad + Adam), ms/step.
    Mirrors the campaign trainer's jit (src/train_stream.py --bf16, the
    round-3 default: bf16 activations/gates, fp32 master params + loss) on
    random data so the driver can see training-throughput regressions."""
    import jax
    import jax.numpy as jnp
    import optax

    from sound_bubble_tpu.losses.snrlp import SNRLPLoss
    from sound_bubble_tpu.utils import cast_bf16

    n = int(seconds * 24000)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, cfg.num_ch, n))
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
            # net is built with compute_dtype="bf16": fp32 inputs, bf16 trunk
            est = net.apply({"params": cast_bf16(p)}, inputs)["output"]
            return jnp.mean(loss_fn(est=est.astype(jnp.float32), gt=gt))
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    import sound_bubble_tpu.ops.rnn as rnn

    def time_step():
        run = jax.jit(step, donate_argnums=(0, 1))
        p, o, loss = run(jax.tree.map(jnp.copy, params),
                         jax.tree.map(jnp.copy, opt_state))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            p, o, loss = run(p, o)
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / steps * 1e3

    # training-path candidates (flags are read at trace time, so each gets
    # a fresh jit): plain autodiff scan, custom-VJP scan (dW_hh hoisted out
    # of the backward scan), fused Pallas fwd/bwd recurrence kernels, and
    # the fused-scan path (in-scan gates + carried weight-grad accumulators,
    # no [T,R,4H] stacking, K=6 frames per while-iteration — see
    # ops/rnn.py:_FUSED_CHUNK). Default is fused only: TPU v5e sweeps
    # (2026-08-17, batch 8 bf16) measured autodiff 254.5 / cvjp 255.7 /
    # pallas 254.6 / fused+chunk6 157.2 ms — the chunked fused scan wins by
    # 1.6x (the step is while-iteration-count-bound, not FLOP-bound), and
    # each extra candidate costs a multi-minute cold compile over the tunnel.
    # Round 4 added "slab" (slab-grid Pallas training scans, the library
    # default on TPU: 128.7 ms vs 150.8 fused-scan best, see DESIGN.md's
    # knob table) — bench defaults to it on TPU so the driver measures the
    # path the trainers actually run.
    # SB_BENCH_TRAIN_PATHS=autodiff,cvjp,pallas,fused,slab re-enables the
    # sweep.
    import os
    default_cand = "slab" if jax.default_backend() == "tpu" else "fused"
    cand = tuple(os.environ.get("SB_BENCH_TRAIN_PATHS",
                                default_cand).split(","))
    saved = (rnn._CUSTOM_VJP, rnn._PALLAS_TRAIN, rnn._FUSED_SCAN, rnn._SLAB)
    results = {}
    try:
        for tag in cand:
            rnn.set_custom_vjp(tag in ("cvjp", "pallas"))
            rnn.set_pallas_train(tag == "pallas")
            rnn.set_fused_scan(tag in ("fused", "slab"))
            rnn.set_slab(tag == "slab")
            try:
                results[tag] = time_step()
            except Exception as e:
                print(f"# train candidate {tag} unavailable: {str(e)[:90]}",
                      flush=True)
    finally:
        (rnn._CUSTOM_VJP, rnn._PALLAS_TRAIN, rnn._FUSED_SCAN,
         rnn._SLAB) = saved
    tag, ms = min(results.items(), key=lambda kv: kv[1])
    print("# train candidates (ms/step): "
          + ", ".join(f"{k}={v:.1f}" for k, v in results.items()), flush=True)
    # (ms/step, audio-sec ingested/s, winning path)
    return ms, batch * seconds / (ms / 1e3), tag


# raspberrypi/orangpi edge model (conv_lstm intra,
# real_experiments/raspberrypi_model_pretrain.json) — unconditioned variant
EDGE_MODEL = {
    "stft_chunk_size": 192, "stft_pad_size": 96, "num_ch": 6, "D": 16,
    "L": 4, "I": 1, "J": 1, "B": 3, "H": 64, "E": 2, "local_atten_len": 100,
    "use_attn": False, "lookahead": True, "chunk_causal": True,
    "use_first_ln": True, "merge_method": "early_cat", "conv_lstm": True,
    "dis_type": "conv3", "lstm_down": 5,
}


def main():
    import jax

    from __graft_entry__ import PROD_MODEL
    from sound_bubble_tpu.models.tfgridnet.model import make_net

    net = make_net(PROD_MODEL)
    cfg = net.cfg
    # Serving measurements stay on the swept XLA streaming path: the slab
    # kernels (TPU training default, see _measure_train) also sit on the
    # F-axis BLSTM of the non-fused streaming forward, but have only been
    # swept/validated at training shapes — pin them off here so the
    # headline serving numbers ride the path they were measured on.
    import sound_bubble_tpu.ops.rnn as _rnn
    _rnn.set_slab(False)
    single_ms = _measure(net, cfg, batch=1)
    fused_ms = _measure_fused(net, cfg)
    if fused_ms is not None and fused_ms < single_ms:
        single_ms = fused_ms  # serve single streams through the fused kernel
    batch_ms = _measure(net, cfg, batch=SERVING_BATCH)
    net16 = make_net({**PROD_MODEL, "compute_dtype": "bf16"})
    # serving candidates: (batch, ms, tag); bf16 halves activation HBM so a
    # 2x batch may fit and lift throughput further
    candidates = [(SERVING_BATCH, batch_ms, "f32")]
    for b in (SERVING_BATCH, 2 * SERVING_BATCH, 4 * SERVING_BATCH):
        try:
            candidates.append(
                (b, _measure(net16, net16.cfg, batch=b, bf16=True), "bf16"))
        except Exception as e:
            print(f"# serving bf16 batch {b} unavailable: "
                  f"{str(e)[:80]}", flush=True)
    best_batch, best_ms, best_tag = max(
        candidates, key=lambda c: c[0] * 8.0 / c[1])
    # direction-fused scan at the winning batch: training-neutral (bwd-
    # dominated) but ~10% faster on the forward-only serving path (measured
    # 3.336 -> 2.993 ms at batch 512 bf16, 2026-08-20) — both scan
    # directions ride one chunked lax.scan, halving iteration count
    try:
        _rnn.set_dir_fuse(True)
        df_ms = _measure(net16, net16.cfg, batch=best_batch, bf16=True)
        if df_ms < best_ms:
            best_ms, best_tag = df_ms, best_tag + "_dirfuse"
    except Exception as e:
        print(f"# serving dirfuse candidate unavailable: {str(e)[:80]}",
              flush=True)
    finally:
        _rnn.set_dir_fuse(False)
    train_ms, train_ingest, train_tag = _measure_train(net16, net16.cfg)

    # edge conv_lstm config single-stream (fused kernel; VERDICT r2 #5)
    edge_net = make_net(EDGE_MODEL, conditional=False)
    edge_ms = _measure_fused(edge_net, edge_net.cfg)
    if edge_ms is None:
        edge_ms = _measure(edge_net, edge_net.cfg, batch=1)

    single_rtf = 8.0 / single_ms
    # headline throughput = best (batch, precision) candidate; bf16 is the
    # standard TPU serving precision, fp32 reported alongside
    throughput_rtf = best_batch * 8.0 / best_ms
    baseline_rtf = 8.0 / 6.36  # reference: 6.36 ms per 8 ms chunk on edge CPU
    print(json.dumps({
        "metric": "streaming_rtf_per_chip",
        "value": round(throughput_rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(throughput_rtf / baseline_rtf, 1),
        "single_stream_rtf": round(single_rtf, 2),
        "single_stream_ms_per_8ms_chunk": round(single_ms, 4),
        "single_stream_ms_fused_kernel": (round(fused_ms, 4)
                                          if fused_ms is not None else None),
        "serving_batch": best_batch,
        "serving_precision": best_tag,
        "batch_ms_per_chunk": round(best_ms, 4),
        "batch_ms_per_chunk_f32": round(batch_ms, 4),
        "train_step_ms": round(train_ms, 1),
        "train_ingest_x_realtime": round(train_ingest, 1),
        "train_path": train_tag,
        "edge_single_stream_ms_per_8ms_chunk": round(edge_ms, 4),
        "serving_ms_min_max": _SPREADS.get(
            f"b{best_batch}{'_bf16' if best_tag.startswith('bf16') else ''}"),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
