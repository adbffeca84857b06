"""Streaming inference wrapper + self-test.

Mirrors `/root/reference/edge/causal_infer.py`: `ModelWrapper.feed` threads
internal state chunk to chunk; `streaming_inference` runs the rolling-window
loop; `__main__` asserts streaming == offline within atol 1e-3.
"""
import numpy as np

from sound_bubble_tpu.runtime.streaming import (  # noqa: F401
    ModelWrapper, streaming_inference, streaming_inference_scan,
)

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from sound_bubble_tpu.models.tfgridnet.model import make_net

    np.random.seed(0)
    model_params = {
        "stft_chunk_size": 192, "stft_pad_size": 96, "num_ch": 6, "D": 16,
        "L": 4, "I": 1, "J": 1, "B": 4, "H": 64, "E": 2, "use_attn": False,
        "lookahead": True, "chunk_causal": True, "use_first_ln": True,
        "merge_method": "early_cat", "conv_lstm": False, "dis_type": "conv3",
    }
    net = make_net(model_params)
    CHUNK_SIZE = model_params["stft_chunk_size"]
    PAD_SIZE = model_params["stft_pad_size"]
    num_chunks = 50
    B, C = 1, model_params["num_ch"]

    X = np.random.randn(B, C, CHUNK_SIZE * num_chunks + PAD_SIZE) \
        .astype(np.float32) * 10
    variables = net.init(jax.random.PRNGKey(0),
                         {"mixture": jnp.asarray(X[..., :CHUNK_SIZE + PAD_SIZE]),
                          "dis_embed": jnp.asarray([[0.0, 0.0, 1.0]])})
    params = variables["params"]

    mdl_os = ModelWrapper(net, params)
    Y = mdl_os.feed(X)  # offline: one call over the whole padded signal

    mdl_stream = ModelWrapper(net, params)
    Z = streaming_inference(mdl_stream, X, chunk_size=CHUNK_SIZE,
                            pad_length=PAD_SIZE)

    Zs = streaming_inference_scan(net, params, X, CHUNK_SIZE, PAD_SIZE)

    print(Z.shape, Y.shape)
    ok = np.allclose(np.asarray(Y), np.asarray(Z), atol=1e-3)
    print("Test successful:", ok)
    print("Max diff:", np.abs(np.asarray(Z) - np.asarray(Y)).max())
    print("Scan-path max diff:", np.abs(np.asarray(Zs) - np.asarray(Y)).max())
