"""TPU device check for the slab-grid LSTM training kernels.

Compiles lstm_slab fwd+bwd on the real TPU at a production-like shape
(bf16 weights/activations, f32 carries), checks primal + grads against the
XLA fused scan ON DEVICE, and times both. This is the on-device complement
to tests/test_lstm_slab.py's interpret-mode checks (CPU XLA's native-bf16
logistic rounds differently; on TPU both paths upcast transcendentals to
f32, so parity here is expected to be tight).

Usage: python tools/slab_tpu_check.py [--t 126] [--rows 1740] [--c 64] [--h 64]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=126)
    ap.add_argument("--rows", type=int, default=1740)  # B*F at prod config
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), flush=True)

    from sound_bubble_tpu.ops import rnn
    from sound_bubble_tpu.ops.pallas import lstm_train_slab as slab

    rng = np.random.default_rng(0)
    c, h, r, t_len = args.c, args.h, args.rows, args.t
    scale = 1.0 / np.sqrt(h)
    p = {
        "w_ih": jnp.asarray(rng.standard_normal((c, 4 * h)) * scale,
                            jnp.bfloat16),
        "w_hh": jnp.asarray(rng.standard_normal((h, 4 * h)) * scale,
                            jnp.bfloat16),
        "b": jnp.asarray(rng.standard_normal(4 * h) * scale, jnp.bfloat16),
    }
    x = jnp.asarray(rng.standard_normal((t_len, r, c)), jnp.bfloat16)
    h0 = jnp.zeros((r, h), jnp.float32)
    c0 = jnp.zeros((r, h), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((t_len, r, h)) / (t_len * r),
                     jnp.float32)

    def loss_slab(p):
        ys, hT, cT = slab.lstm_slab(False, p["w_ih"], p["w_hh"], p["b"],
                                    x, h0, c0)
        return jnp.sum(ys.astype(jnp.float32) * wy) + 1e-3 * (
            jnp.sum(hT) + jnp.sum(cT))

    def loss_fused(p):
        ys, hT, cT = rnn.lstm_fused(False, p["w_ih"], p["w_hh"], p["b"],
                                    x, h0, c0)
        return jnp.sum(ys.astype(jnp.float32) * wy) + 1e-3 * (
            jnp.sum(hT) + jnp.sum(cT))

    g_slab = jax.jit(jax.value_and_grad(loss_slab))
    g_fused = jax.jit(jax.value_and_grad(loss_fused))

    t0 = time.time()
    vs, gs = jax.block_until_ready(g_slab(p))
    print(f"slab compile+run ok in {time.time()-t0:.1f}s, loss={float(vs):.6f}",
          flush=True)
    t0 = time.time()
    vf, gf = jax.block_until_ready(g_fused(p))
    print(f"fused compile+run ok in {time.time()-t0:.1f}s, loss={float(vf):.6f}",
          flush=True)

    rel = abs(float(vs) - float(vf)) / (abs(float(vf)) + 1e-12)
    print(f"primal rel diff: {rel:.3e}")
    worst = 0.0
    for k in p:
        a = np.asarray(gs[k], np.float32)
        b = np.asarray(gf[k], np.float32)
        d = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
        worst = max(worst, float(d))
        print(f"grad {k}: max-norm-rel {d:.3e}")
    ok = rel < 5e-3 and worst < 0.03
    print("PARITY", "OK" if ok else "FAIL")

    # timing: on-device loop amortizes dispatch (CLAUDE.md)
    def bench(fn, tag):
        for _ in range(3):
            jax.block_until_ready(fn(p))
        t0 = time.time()
        for _ in range(args.iters):
            v, g = fn(p)
        jax.block_until_ready(v)
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"{tag}: {dt:.2f} ms per value_and_grad")
        return dt

    ts = bench(g_slab, "slab ")
    tf = bench(g_fused, "fused")
    print(f"speedup vs fused scan: {tf/ts:.2f}x")


if __name__ == "__main__":
    main()
