"""Pre-generate a train_stream pool-cache entry on the host CPU.

The round-4 session-restart wiped runs/pool_cache; the trainer regenerates a
missing pool inside its own deadline box (src/train_stream.py:115-146), which
eats the training budget. This writes the exact same cache file out-of-band
(same key scheme: {tag}_{n}_{seed}.npz, bg prefix when bg_noise>0) so the
boxed stage hits the cache.

    python tools/pregen_pool.py --n 4000 --seed 49 --tag train --bg
    python tools/pregen_pool.py --n 180 --seed 549 --tag val --bg
"""
import argparse
from pathlib import Path

import numpy as np

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # host ISM only; never touch the TPU

from sound_bubble_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

import jax.numpy as jnp  # noqa: E402

from sound_bubble_tpu.datagen import campaign  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--seed", type=int, required=True)
    p.add_argument("--tag", default="train")
    p.add_argument("--bg", action="store_true")
    p.add_argument("--cache_dir", default="runs/pool_cache")
    p.add_argument("--sr", type=int, default=24000)
    p.add_argument("--rir_len", type=int, default=12000)
    p.add_argument("--max_order", type=int, default=32)
    args = p.parse_args()

    tag = ("bg" if args.bg else "") + args.tag
    out = Path(args.cache_dir) / f"{tag}_{args.n}_{args.seed}.npz"
    if out.exists():
        print(f"already cached: {out}")
        return
    pool, _ = campaign.build_pool(
        args.n, seed=args.seed, sr=args.sr, rir_len=args.rir_len,
        order_range=(min(10, args.max_order), args.max_order),
        dtype=jnp.float32, to_device=False, bg_noise=args.bg)
    out.parent.mkdir(parents=True, exist_ok=True)
    # _meta pins the acoustic params the filename doesn't encode;
    # train_stream.host_pool validates it on load (ADVICE r4 #1)
    np.savez(out, _meta=np.asarray([args.sr, args.rir_len, args.max_order]),
             **pool)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
