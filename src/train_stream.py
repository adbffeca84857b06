"""Streaming on-device training campaign CLI.

The reference trains by re-reading 30k offline-rendered clips for 200 epochs
(`/root/reference/src/train_pt.py` + `syn_experiments/pretrain_stage.json`).
This CLI is the TPU-native counterpart for hosts that cannot feed the chip
from disk: the room-acoustics pool is synthesized ON DEVICE once
(`datagen.campaign.build_pool`), and every training step draws fresh
sources/SNRs/scenarios inside ONE jitted function (datagen + forward + loss
+ grad + Adam update), so the host only supplies a PRNG key per step.

Checkpoints (`checkpoints/last.pt` / `best.pt`) and `config.json` use the
exact reference run-dir layout, so `src/eval_syn.py`, `src/test_samples.py`
and `utils.load_torch_pretrained` work on the result unchanged.

Usage:
  python src/train_stream.py --run_dir runs/campaign \
      --config syn_experiments/pretrain_stage.json \
      --steps 20000 --pool 3000 --clip_seconds 3.0
"""
from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


VAL_SEED = 500


def build_module(params_cfg, run_dir):
    """PLModule via the config system (gives us optimizer/scheduler/ckpt
    semantics + the eval-compatible model handle) without host datasets."""
    import sound_bubble_tpu.utils as utils

    pl_args = dict(params_cfg["pl_module_args"])
    if "grad_clip" in params_cfg:
        pl_args["grad_clip"] = params_cfg["grad_clip"]
    module = utils.import_attr(params_cfg["pl_module"])(**pl_args)
    return module


def main(args):
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    from sound_bubble_tpu.datagen import campaign
    from sound_bubble_tpu.train.checkpoint import save_checkpoint
    from sound_bubble_tpu.train.optim import ReduceLROnPlateau

    with open(args.config) as f:
        cfg = json.load(f)

    run_dir = Path(args.run_dir)
    (run_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    with open(run_dir / "config.json", "w") as f:
        json.dump(cfg, f, indent=2)

    # precision is part of the run: a --resume relaunch (the stall-watchdog
    # pattern) must not silently flip a campaign between fp32 and bf16
    args_path = run_dir / "train_stream_args.json"
    if args.resume and args_path.exists():
        recorded = json.load(open(args_path))
        if recorded.get("bf16") != args.bf16:
            print(f"RESUME: honoring the run's recorded precision "
                  f"bf16={recorded.get('bf16')} (flag said {args.bf16})",
                  flush=True)
            args.bf16 = recorded.get("bf16")
        rec_bg = recorded.get("bg_noise", 0.0)
        if rec_bg != args.bg_noise:
            print(f"RESUME: honoring the run's recorded bg_noise={rec_bg} "
                  f"(flag said {args.bg_noise})", flush=True)
            args.bg_noise = rec_bg
    else:
        with open(args_path, "w") as f:
            json.dump({"bf16": args.bf16, "voice": args.voice,
                       "batch": args.batch, "clip_seconds": args.clip_seconds,
                       "snr_range": [args.snr_min, args.snr_max],
                       "bg_noise": args.bg_noise}, f)

    # training default: fused-chunked LSTM scans (in-scan gates, carried
    # weight-grad accumulators, 6 frames per while-iteration) — 1.6x the
    # autodiff step on TPU v5e (157 vs 254 ms, sweep in ops/rnn.py). Exact
    # same math/grads (tests/test_rnn.py pins both to 1e-5). SB_LSTM_FUSED=0
    # opts out.
    import sound_bubble_tpu.ops.rnn as rnn
    rnn.set_fused_scan(os.environ.get("SB_LSTM_FUSED", "1") == "1")

    module = build_module(cfg, run_dir)
    net, loss_fn = module.net, module.loss_fn
    tx = module.optimizer.tx
    if args.bf16:
        # bf16 TRUNK with fp32 waveform/STFT/feature front-end (the input
        # itself is never quantized — cfg.compute_dtype, model.py)
        import dataclasses as _dc
        from sound_bubble_tpu.models.tfgridnet.model import Net as _Net
        net = _Net(_dc.replace(net.cfg, compute_dtype="bf16"))

    sr = cfg["pl_module_args"]["sr"]
    n_samples = int(args.clip_seconds * sr)
    batch = args.batch or cfg.get("batch_size", 8)

    print(f"building pool: {args.pool} scenarios "
          f"(rir_len {args.rir_len}) ...", flush=True)
    t0 = time.time()
    orders = (min(10, args.max_order), args.max_order)
    pool_dtype = jnp.bfloat16 if args.pool_bf16 else jnp.float32

    def host_pool(n, seed, tag):
        if args.bg_noise > 0:
            tag = "bg" + tag             # bg pools carry an extra slot (the
            # prefix keeps the plain tags' glob fallback from matching them)
        cache = (Path(args.pool_cache) / f"{tag}_{n}_{seed}.npz"
                 if args.pool_cache else None)
        if cache is not None and not cache.exists():
            # a larger same-seed pool can be sliced (scenarios are drawn
            # sequentially from one generator)
            for cand in sorted(cache.parent.glob(f"{tag}_*_{seed}.npz")):
                try:
                    n_cand = int(cand.stem.split("_")[-2])
                except ValueError:
                    continue
                if n_cand >= n:
                    cache = cand
                    break
        if cache is not None and cache.exists():
            z = np.load(cache)
            if "_meta" in z.files:
                # pools are keyed by {tag}_{n}_{seed}; the acoustic params
                # live inside the file — reject a cache generated with a
                # different sr/rir_len/max_order instead of silently
                # training on it (ADVICE r4 #1)
                want = np.asarray([sr, args.rir_len, args.max_order])
                if not np.array_equal(z["_meta"], want):
                    raise SystemExit(
                        f"pool cache {cache} was generated with "
                        f"sr/rir_len/max_order={z['_meta'].tolist()} but "
                        f"this run wants {want.tolist()}; delete or "
                        f"regenerate it (tools/pregen_pool.py)")
            pool_ = {k: z[k][:n] for k in z.files if k != "_meta"}
            print(f"loaded cached pool {cache}", flush=True)
        elif args.require_pool_cache:
            raise SystemExit(
                f"--require_pool_cache: no cache for {tag}_{n}_{seed} under "
                f"{args.pool_cache}; pregen it out-of-band first "
                f"(python tools/pregen_pool.py --n {n} --seed {seed} "
                f"--tag {tag.removeprefix('bg')}"
                f"{' --bg' if tag.startswith('bg') else ''})")
        else:
            pool_, _ = campaign.build_pool(
                n, seed=seed, sr=sr, rir_len=args.rir_len,
                order_range=orders, dtype=jnp.float32, to_device=False,
                bg_noise=args.bg_noise > 0)
            if cache is not None:
                cache.parent.mkdir(parents=True, exist_ok=True)
                np.savez(cache, _meta=np.asarray(
                    [sr, args.rir_len, args.max_order]), **pool_)
        if pool_dtype != jnp.float32:
            import ml_dtypes
            pool_["rirs"] = pool_["rirs"].astype(ml_dtypes.bfloat16)
        return pool_

    pool = host_pool(args.pool, args.seed, "train")
    val_pool = host_pool(args.val_pool, args.seed + VAL_SEED, "val")
    idx_probs = None
    if args.radius_weights or args.nin_weights:
        parse = lambda s: [float(w) for w in s.split(",")] if s else None
        rw, nw = parse(args.radius_weights), parse(args.nin_weights)
        idx_probs = campaign.scenario_probs(
            {k: np.asarray(pool[k]) for k in ("dis_embed", "near_mask")},
            radius_weights=rw, nin_weights=nw)
        cls = 2 - np.argmax(np.asarray(pool["dis_embed"]), axis=1)
        mix = [round(float(idx_probs[cls == i].sum()), 3) for i in range(3)]
        nin = np.rint(np.asarray(pool["near_mask"]).sum(1)).astype(int)
        nmix = [round(float(idx_probs[nin == i].sum()), 3) for i in range(3)]
        print(f"radius_weights {rw} nin_weights {nw} -> "
              f"radius mix 1.0/1.5/2.0 m = {mix}, n_in mix 0/1/2 = {nmix}",
              flush=True)
    print(f"pool built in {time.time() - t0:.0f}s; uploading ...", flush=True)
    t0 = time.time()
    pool = jax.tree_util.tree_map(
        lambda a: jax.block_until_ready(jax.device_put(a)), pool)
    val_pool = jax.tree_util.tree_map(
        lambda a: jax.block_until_ready(jax.device_put(a)), val_pool)
    print(f"pool on device in {time.time() - t0:.0f}s", flush=True)

    def batch_loss(params, key, pool_, idx):
        inputs, targets = campaign.make_batch(
            key, pool_, idx, n_samples=n_samples, sr=sr,
            snr_range=(args.snr_min, args.snr_max), voice=args.voice,
            bg_noise_p=args.bg_noise, dense2_p=args.dense2_p)
        model_in = {"mixture": inputs["mixture"]}
        if getattr(net.cfg, "conditional", True):
            model_in["dis_embed"] = inputs["dis_embed"]
        if args.bf16:
            # mixed precision: bf16 weights/trunk on the MXU (the net was
            # built with compute_dtype="bf16"; inputs stay fp32), fp32
            # master params + loss (grads arrive fp32 through the cast)
            import sound_bubble_tpu.utils as utils
            est = net.apply({"params": utils.cast_bf16(params)},
                            model_in)["output"].astype(jnp.float32)
        else:
            est = net.apply({"params": params}, model_in)["output"]
        gt = targets["target"]
        per = jnp.atleast_1d(loss_fn(est=est, gt=gt))
        loss = jnp.mean(per)
        # monitoring: si-sdr improvement on positive samples
        def sisdr(e, g):
            e = e - e.mean(-1, keepdims=True)
            g = g - g.mean(-1, keepdims=True)
            s = (jnp.sum(e * g, -1, keepdims=True)
                 / (jnp.sum(g * g, -1, keepdims=True) + 1e-8)) * g
            return 10 * jnp.log10(jnp.sum(s ** 2, -1)
                                  / (jnp.sum((e - s) ** 2, -1) + 1e-8) + 1e-8)
        pos = jnp.max(jnp.abs(gt), axis=(1, 2)) > 0
        mix0 = inputs["mixture"][:, 0:1]
        imp = sisdr(est[:, 0], gt[:, 0]) - sisdr(mix0[:, 0], gt[:, 0])
        sisdri = jnp.sum(jnp.where(pos, imp, 0.0)) / jnp.maximum(
            jnp.sum(pos), 1)
        return loss, sisdri

    # pools are ARGUMENTS of the jitted steps, never closure constants —
    # closing over multi-GB device arrays embeds them in the lowered module
    # and ships them through the (remote) compiler.
    def train_step(params, opt_state, lr, key, idx, pool_):
        (loss, sisdri), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params, key, pool_, idx)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, sisdri

    jit_train = jax.jit(train_step, donate_argnums=(0, 1))
    jit_val = jax.jit(lambda p, k, i, vp: batch_loss(p, k, vp, i))

    params, opt_state = module.params, module.optimizer.state
    start_step = 0
    last_path = run_dir / "checkpoints" / "last.pt"
    if args.resume and last_path.exists():
        module.load_state(str(last_path))
        params, opt_state = module.params, module.optimizer.state
        start_step = module.epoch * args.val_every
        print(f"resumed from {last_path} at step {start_step}")
    scheduler = ReduceLROnPlateau(
        module.optimizer, mode="min", patience=args.plateau_patience,
        factor=0.5, min_lr=1e-6)

    rng = np.random.default_rng(args.seed + 1)
    key = jax.random.PRNGKey(args.seed)
    log_path = run_dir / "metrics.jsonl"
    best_val = np.inf
    losses = []
    t_start = time.time()
    t_window = time.time()

    def run_val(params):
        vl, vs = [], []
        vkey = jax.random.PRNGKey(VAL_SEED)
        n_val = int(val_pool["active"].shape[0])
        for i in range(args.val_batches):
            vkey, k = jax.random.split(vkey)
            idx = jnp.asarray(
                np.random.default_rng(1000 + i).integers(0, n_val, batch))
            l, s = jit_val(params, k, idx, val_pool)
            vl.append(float(l))
            vs.append(float(s))
        return float(np.mean(vl)), float(np.mean(vs))

    for step in range(start_step, args.steps):
        key, k = jax.random.split(key)
        if idx_probs is not None:
            idx = jnp.asarray(rng.choice(len(idx_probs), batch, p=idx_probs))
        else:
            idx = jnp.asarray(rng.integers(0, args.pool, batch))
        params, opt_state, loss, sisdri = jit_train(
            params, opt_state, jnp.float32(module.optimizer.lr), k, idx,
            pool)
        losses.append(loss)  # device value; only sync at log time

        if (step + 1) % args.log_every == 0:
            lval = float(jnp.mean(jnp.stack(losses)))
            losses = []
            sps = args.log_every * batch / (time.time() - t_window)
            t_window = time.time()
            rec = dict(step=step + 1, train_loss=round(lval, 4),
                       train_sisdri=round(float(sisdri), 3),
                       lr=float(module.optimizer.lr),
                       samples_per_sec=round(sps, 2),
                       elapsed_min=round((time.time() - t_start) / 60, 1))
            print(json.dumps(rec), flush=True)
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

        if (step + 1) % args.val_every == 0 or step + 1 == args.steps:
            val_loss, val_sisdri = run_val(params)
            module.params, module.optimizer.state = params, opt_state
            module.epoch = (step + 1) // args.val_every
            epoch = module.epoch - 1
            module.metric_values[epoch] = {
                "val/loss": {"epoch": val_loss, "num_elements": 1},
                "val/si_sdr_i": {"epoch": val_sisdri, "num_elements": 1},
            }
            module.dump_state(str(last_path))
            if val_loss < best_val:
                best_val = val_loss
                module.dump_state(str(run_dir / "checkpoints" / "best.pt"))
                tag = " (best)"
            else:
                tag = ""
            rec = dict(step=step + 1, val_loss=round(val_loss, 4),
                       val_sisdri=round(val_sisdri, 3),
                       lr=float(module.optimizer.lr))
            print(json.dumps(rec) + tag, flush=True)
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            scheduler.step(val_loss)
            # dump_state moved params to host; keep the device copies
            params = jax.device_put(params)
            opt_state = jax.device_put(opt_state)

    print(f"done: {args.steps} steps in "
          f"{(time.time() - t_start) / 60:.1f} min; best val {best_val:.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--pool", type=int, default=3000)
    p.add_argument("--val_pool", type=int, default=180)
    p.add_argument("--val_batches", type=int, default=8)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--clip_seconds", type=float, default=3.0)
    p.add_argument("--rir_len", type=int, default=12000)
    p.add_argument("--max_order", type=int, default=32)
    p.add_argument("--snr_min", type=float, default=-10.0)
    p.add_argument("--snr_max", type=float, default=5.0)
    p.add_argument("--val_every", type=int, default=250)
    p.add_argument("--log_every", type=int, default=25)
    p.add_argument("--plateau_patience", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--pool_bf16", action="store_true",
                   help="store the RIR pool in bf16 (halves HBM)")
    p.add_argument("--voice", default="formant",
                   choices=("formant", "harmonic", "mix"),
                   help="source model: Klatt-style formant voices (round 3), "
                        "the round-2 harmonic quasi-speech, or a 75/25 "
                        "per-source mix of both (widest timbre coverage)")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="mixed-precision train step (bf16 activations, "
                        "fp32 master params/LSTM carry/loss)")
    p.add_argument("--bg_noise", type=float, default=0.0,
                   help="probability a sample carries far-field background "
                        "noise (reference n_BG in {0,1}; needs a bg pool — "
                        "see datagen.campaign.make_batch)")
    p.add_argument("--radius_weights", default=None,
                   help="comma weights for the 1.0/1.5/2.0 m radius classes "
                        "(e.g. '1,1.5,2.5' oversamples larger bubbles); "
                        "default uniform")
    p.add_argument("--nin_weights", default=None,
                   help="comma weights for the 0/1/2 in-bubble-speaker "
                        "classes (e.g. '1.2,1,1.6' oversamples the "
                        "empty-bubble mute case and dense 2-speaker "
                        "overlap); default uniform")
    p.add_argument("--dense2_p", type=float, default=0.0,
                   help="probability a 2-in-bubble sample uses the dense-"
                        "overlap curriculum (close-F0, pause-free in-bubble "
                        "pair — datagen.campaign.make_batch)")
    p.add_argument("--pool_cache", default=None,
                   help="directory for cached scenario pools (npz)")
    p.add_argument("--require_pool_cache", action="store_true",
                   help="hard-fail when the pool cache entry is absent "
                        "instead of rebuilding it in-process (keeps "
                        "deadline-boxed campaign stages from spending "
                        "their budget on datagen)")
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (the TPU plugin overrides "
                        "JAX_PLATFORMS; tests/smoke runs need this)")
    main(p.parse_args())
