"""Device smoke for the in-kernel attention fast path (ADVICE r3 medium).

The `attn_vmem` variants' Mosaic lowering (dynamic `pl.dslice` ring writes on
4-D refs + per-head in-kernel concatenate, ops/pallas/stack_kernel.py) is
parity-tested interpret-only on CPU; this script compiles and runs it on the
REAL TPU and checks chunked-stream parity against the XLA ModelWrapper path,
so a Mosaic lowering failure surfaces here instead of at serving time.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/attn_tpu_smoke.py
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from sound_bubble_tpu.models.tfgridnet.model import make_net
from sound_bubble_tpu.runtime.fast_path import FusedStreamer
from sound_bubble_tpu.runtime.streaming import ModelWrapper, streaming_inference

SMALL = dict(stft_chunk_size=32, stft_pad_size=16, num_ch=6, D=8, B=3, H=8,
             L=2, E=2, chunk_causal=True, use_first_ln=True,
             merge_method="early_cat", dis_type="conv3",
             use_attn=True, local_atten_len=5)


def run_variant(name, extra):
    params_dict = dict(SMALL, **extra)
    net = make_net(params_dict, conditional=True)
    cfg = net.cfg
    rng = np.random.default_rng(7)
    x = rng.standard_normal(
        (1, 6, cfg.stft_back_pad + cfg.stft_chunk_size * 8
         + cfg.stft_pad_size)).astype(np.float32) * 3
    dis = jnp.asarray([[0.0, 1.0, 0.0]])
    inputs = {"mixture": jnp.asarray(x[..., :cfg.n_fft]), "dis_embed": dis}
    params = net.init(jax.random.PRNGKey(0), inputs)["params"]

    ref = np.asarray(streaming_inference(
        ModelWrapper(net, params), x, cfg.stft_chunk_size,
        cfg.stft_pad_size + cfg.stft_back_pad, dis_embed=dis))

    fs = FusedStreamer(net, params, dis_embed=dis, interpret=False,
                       attn_in_kernel=True)
    assert fs._attn_in_kernel, "gate refused the in-kernel attention path"
    T, P = cfg.stft_chunk_size, cfg.stft_pad_size + cfg.stft_back_pad
    window = np.zeros((1, 6, T + P), np.float32)
    window[..., -P:] = x[..., :P]
    outs = []
    for i in range(P, x.shape[-1] - T + 1, T):
        window = np.roll(window, -T, axis=-1)
        window[..., -T:] = x[..., i:i + T]
        outs.append(np.asarray(fs.feed(jnp.asarray(window))))
    got = np.concatenate(outs, axis=-1)
    n = min(got.shape[-1], ref.shape[-1])
    diff = float(np.max(np.abs(got[..., :n] - ref[..., :n])))
    scale = float(np.max(np.abs(ref[..., :n])) + 1e-9)
    return {"variant": name, "platform": jax.devices()[0].platform,
            "max_abs_diff": diff, "rel": diff / scale}


def main():
    results = []
    for name, extra in [("attn_vmem", {}),
                        ("attn_conv_vmem", dict(conv_lstm=True, lstm_down=2))]:
        r = run_variant(name, extra)
        print(json.dumps(r), flush=True)
        results.append(r)
    # bf16 MXU on device: allow a loose-but-meaningful band (CPU interpret
    # parity is pinned at 1e-5 in tests/test_fast_path.py; here we only need
    # "compiles, runs, and is numerically the same computation").
    bad = [r for r in results if r["rel"] > 5e-2]
    if bad:
        print("SMOKE FAIL", json.dumps(bad))
        sys.exit(1)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
