"""Prebuild the campaign pool caches on the host CPU.

Writes exactly the npz files `src/train_stream.py:host_pool` would build
(same tag/n/seed filenames, same build_pool arguments: rir_len 12000,
order_range (10, 32), fp32, host method) so the TPU campaign stages start
instantly instead of serializing ~32 min of single-CPU ISM per stage.

  python tools/prebuild_pools.py runs/pool_cache \
      train:4000:42 val:180:542 bgtrain:4000:44:bg ...
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sound_bubble_tpu.datagen import campaign

    cache_dir = Path(sys.argv[1])
    cache_dir.mkdir(parents=True, exist_ok=True)
    for spec in sys.argv[2:]:
        parts = spec.split(":")
        tag, n, seed = parts[0], int(parts[1]), int(parts[2])
        bg = len(parts) > 3 and parts[3] == "bg"
        out = cache_dir / f"{tag}_{n}_{seed}.npz"
        if out.exists():
            print(f"{out} exists, skipping", flush=True)
            continue
        t0 = time.time()
        print(f"building {out} (bg_noise={bg}) ...", flush=True)
        pool, _ = campaign.build_pool(
            n, seed=seed, sr=24000, rir_len=12000, order_range=(10, 32),
            dtype=jnp.float32, to_device=False, bg_noise=bg)
        tmp = out.with_suffix(".tmp.npz")
        np.savez(tmp, **pool)
        tmp.rename(out)
        print(f"{out} done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
